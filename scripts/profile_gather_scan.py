"""Correct full-neighborhood-contraction microbench (axon-safe).

Methodology note (round 2): on the tunneled axon runtime,
``jax.block_until_ready`` does NOT wait for device execution — standalone
per-dispatch timing measures the ENQUEUE rate, not the compute (numbers
like "128 MB gathered in 25 us" = 3 TB/s came out of the naive loop).
Only a device->host VALUE FETCH synchronizes.  So: run the op S times
inside one jitted ``lax.scan`` (iteration-dependent indices so nothing can
be hoisted, a carried checksum so nothing can be elided) and fetch ONE
scalar; ms = wall / S.  This mirrors how the op runs in production (the
whole epoch is one scan).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scan_time(make_body, steps=200):
    """make_body() -> (body(carry, xs), xs_array).  Returns ms/step."""
    body, xs = make_body()

    @jax.jit
    def run(xs):
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return c

    c = run(xs)
    _ = float(c)                      # sync (compile + first exec)
    t0 = time.time()
    c = run(xs)
    _ = float(c)
    return (time.time() - t0) / steps * 1e3


def bench(n, d, k, f, dtype, variant, chunk=None, steps=200,
          sentinel_frac=0.0):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(n + 1, d)), dtype=dtype)
    idx0 = np.asarray(rng.integers(0, n - steps, size=(f, k),
                                   dtype=np.int32))
    if sentinel_frac > 0:
        # realistic padded-row layout: each row's trailing slots hold the
        # sentinel id N (zero row), deg ~ Binomial around (1-frac)*k
        deg = rng.binomial(k, 1.0 - sentinel_frac, size=f)
        mask = np.arange(k)[None, :] >= deg[:, None]
        idx0[mask] = n - steps            # max valid base (maps to ~N)
    idx0 = jnp.asarray(idx0)
    w = jnp.asarray(rng.random((f, k)).astype(np.float32) / k)

    def contract(idx, wc):
        if variant == "einsum":
            return jnp.einsum("fk,fkd->fd", wc, jnp.take(table, idx, axis=0))
        if variant == "f32acc":
            rows = jnp.take(table, idx, axis=0).astype(jnp.float32)
            return jnp.einsum("fk,fkd->fd", wc, rows)
        raise ValueError(variant)

    def make_body():
        def body(carry, off):
            idx = idx0 + off          # iteration-dependent: no hoisting
            if chunk is None:
                out = contract(idx, w)
            else:
                idx_c = idx.reshape(f // chunk, chunk, k)
                w_c = w.reshape(f // chunk, chunk, k)
                out = jax.lax.map(lambda p: contract(*p),
                                  (idx_c, w_c)).reshape(f, d)
            return carry + jnp.sum(out), ()
        return body, jnp.arange(steps, dtype=jnp.int32)

    return scan_time(make_body, steps)


def main():
    n, d, k = 233_000, 128, 64
    which = sys.argv[1] if len(sys.argv) > 1 else "chunk"
    log(f"devices={jax.devices()}  N={n} d={d}; scan-of-200 timing "
        f"[{which}]")
    if which == "chunk":
        for f in (512, 4096):
            for tag, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
                ms = bench(n, d, k, f, dt, "einsum")
                gb = f * k * d * jnp.dtype(dt).itemsize / 1e9
                log(f"  F={f:<5d} [{tag}] einsum        {ms:7.3f} ms "
                    f"({gb / (ms / 1e3):6.1f} GB/s)")
                for chunk in (512, 1024):
                    if chunk >= f:
                        continue
                    ms = bench(n, d, k, f, dt, "einsum", chunk=chunk)
                    log(f"  F={f:<5d} [{tag}] chunk={chunk:<5d}   "
                        f"{ms:7.3f} ms ({gb / (ms / 1e3):6.1f} GB/s)")
                if tag == "bf16":
                    ms = bench(n, d, k, f, dt, "f32acc")
                    log(f"  F={f:<5d} [{tag}] f32acc        {ms:7.3f} ms")
    elif which == "width":
        # Does gather cost scale with the issued slot count?  (the
        # degree-bucketing question: mean degree 28 vs Dcap 64 means 56%
        # of slots are sentinel padding)
        f = 4096
        for tag, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
            for kk in (16, 32, 64):
                ms = bench(n, d, kk, f, dt, "einsum")
                log(f"  F={f} K={kk:<3d} [{tag}] random      {ms:7.3f} ms")
            # realistic padded rows: binomial degree, trailing sentinels
            ms = bench(n, d, 64, f, dt, "einsum", sentinel_frac=0.56)
            log(f"  F={f} K=64  [{tag}] 56% sentinel {ms:7.3f} ms")


if __name__ == "__main__":
    main()
