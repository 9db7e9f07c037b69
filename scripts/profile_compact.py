"""Microbench: table-based (O(N)) vs sort/searchsorted (candidate-sized)
field compaction on TPU, plus component timings.

Motivation: the residual ablation (profile_residual.py) showed the
scheduler at 0.6 ms (batch 512) / 1.56 ms (batch 4096) per step, and the
N-sized tables in compact_field (233k-element cumsum + masks) looked like
the obvious cost.  A candidate-sized rewrite (compact_lookup) was tried —
and measured SLOWER end-to-end (profile_importance.py: NS 0.89->0.97 at
512, IS 16->68 ms at 4096).  This isolates why.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from stochastic_gcn_tpu.sampler.scheduler import compact_field, compact_lookup


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 233_000
STEPS = 200


def scan_time(fn, *args, steps=STEPS):
    """Time fn inside a lax.scan (the production dispatch granularity)."""
    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(steps))
        return c
    _ = float(run(args))           # compile + one-time fetch
    t0 = time.time()
    _ = float(run(args))
    return (time.time() - t0) / steps * 1e3


def main():
    log(f"devices={jax.devices()}")
    rng = np.random.default_rng(0)
    for f, k, qk in ((512, 1, 64), (4096, 1, 64)):
        field = jnp.asarray(
            rng.choice(N, size=f, replace=False).astype(np.int32))
        new = jnp.asarray(
            rng.integers(0, N, size=(f, k)).astype(np.int32))
        qbig = jnp.asarray(
            rng.integers(0, N, size=(f, qk)).astype(np.int32))
        cap = f + min(f * k, N)

        log(f"\n=== F={f} k={k} N={N} ===")
        ms = scan_time(lambda fo, ni: compact_field(fo, ni, N, cap),
                       field, new)
        log(f"  compact_field (N-table)             {ms:7.3f} ms")
        ms = scan_time(
            lambda fo, ni: compact_lookup(fo, ni, ni, N, cap), field, new)
        log(f"  compact_lookup (query=[F,{k}])       {ms:7.3f} ms")
        ms = scan_time(
            lambda fo, ni, q: compact_lookup(fo, ni, q, N, cap),
            field, new, qbig)
        log(f"  compact_lookup (query=[F,{qk}])      {ms:7.3f} ms")

        # components
        ms = scan_time(lambda x: jnp.sort(x.reshape(-1)), new)
        log(f"  sort [{f*k}]                        {ms:7.3f} ms")
        ms = scan_time(lambda x: jnp.argsort(x), field)
        log(f"  argsort [{f}]                       {ms:7.3f} ms")
        sf = jnp.sort(field)
        ms = scan_time(
            lambda a, v: jnp.searchsorted(a, v, side="left"), sf, qbig)
        log(f"  searchsorted [{f}] x [F,{qk}]        {ms:7.3f} ms")
        ms = scan_time(
            lambda a, v: jnp.searchsorted(a, v, side="left"), sf, new)
        log(f"  searchsorted [{f}] x [F,{k}]         {ms:7.3f} ms")
        mask = jnp.zeros(N + 1, bool).at[new.reshape(-1)].set(True)
        ms = scan_time(lambda m: jnp.cumsum(m.astype(jnp.int32)), mask)
        log(f"  cumsum [N+1]                        {ms:7.3f} ms")
        ms = scan_time(
            lambda ids: jnp.zeros(N + 1, bool).at[ids.reshape(-1)]
            .set(True), qbig)
        log(f"  bool scatter [F*{qk} -> N]           {ms:7.3f} ms")


if __name__ == "__main__":
    main()
