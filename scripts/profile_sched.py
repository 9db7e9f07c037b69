"""Profile schedule() end-to-end on the bench graph: uniform vs IS,
exact vs approx Gumbel top-k.

Historical finding (2026-08, TPU v5e, this script + profile_compact.py):
a candidate-sized compaction rewrite (sort + searchsorted over the F*(k+1)
candidate ids instead of compact_field's N-sized cumsum/masks) measured
STRICTLY SLOWER — schedule-only, CV degree=1:

    batch 512:  uniform 0.28 -> 0.56 ms   IS 1.51 -> 7.44 ms
    batch 4096: uniform 1.32 -> 1.93 ms   IS 9.01 -> 63.5 ms

even though every component benches at the ~0.15 ms scan floor in
isolation: wide O(N) passes are single bandwidth-trivial kernels, while a
chain of small dependent sorts/searches pays per-op latency, and the IS
path's [F, Dcap] position queries amplified it.  The rewrite was removed;
compact_field's O(N) tables are the TPU-correct design.

Also isolated here: gumbel + exact top_k(512) over 233k scores = 0.584 ms
vs approx_max_k = 0.217 ms (k=4096: 0.741 vs 0.565) — why is_approx_topk
defaults true.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_reddit_like, PAD_DEG
from stochastic_gcn_tpu.data.graph import pad_csr
from stochastic_gcn_tpu.sampler import scheduler as S


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scan_time(fn, args, steps):
    @jax.jit
    def run(args):
        def body(c, i):
            out = fn(jax.random.fold_in(jax.random.PRNGKey(0), i), *args)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(steps))
        return c
    _ = float(run(args))
    t0 = time.time()
    _ = float(run(args))
    return (time.time() - t0) / steps * 1e3


def main():
    log(f"devices={jax.devices()}")
    ds = build_reddit_like()
    g = pad_csr(ds.train_adj, PAD_DEG)
    n = ds.num_data
    imp = S.compute_importance(g)
    rng = np.random.default_rng(0)

    for batch, steps in ((512, 200), (4096, 60)):
        ids = jnp.asarray(
            rng.choice(ds.train_d, size=batch, replace=False)
            .astype(np.int32))
        log(f"\n=== batch={batch} (schedule only, CV, degree=1) ===")
        ms = scan_time(
            lambda k, b: S.schedule(k, g, b, (1,), cv=True), (ids,), steps)
        log(f"  uniform                 {ms:7.3f} ms")
        ms = scan_time(
            lambda k, b, i: S.schedule(k, g, b, (1,), cv=True,
                                       importance=i,
                                       is_approx_topk=False),
            (ids, imp), steps)
        log(f"  IS exact-topk           {ms:7.3f} ms")
        ms = scan_time(
            lambda k, b, i: S.schedule(k, g, b, (1,), cv=True,
                                       importance=i, is_approx_topk=True),
            (ids, imp), steps)
        log(f"  IS approx-topk          {ms:7.3f} ms")

        k_sel = min(batch, n)
        score = jnp.asarray(rng.normal(size=n + 1).astype(np.float32))
        ms = scan_time(
            lambda k, s: jax.lax.top_k(s + jax.random.gumbel(k, s.shape),
                                       k_sel)[1].astype(jnp.float32),
            (score,), steps)
        log(f"  exact top_k({k_sel}) of [N+1]   {ms:7.3f} ms")
        ms = scan_time(
            lambda k, s: jax.lax.approx_max_k(
                s + jax.random.gumbel(k, s.shape), k_sel,
                recall_target=0.95)[1].astype(jnp.float32),
            (score,), steps)
        log(f"  approx_max_k({k_sel}) of [N+1]  {ms:7.3f} ms")


if __name__ == "__main__":
    main()
