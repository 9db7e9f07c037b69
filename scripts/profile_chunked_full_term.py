"""Chunked full-neighborhood contraction experiment (VERDICT r1 #6).

profile_cv_terms.py found a cliff in XLA's gather+einsum strategy:
F=512 runs at ~485 GB/s effective (0.033 ms) while F=4096 runs at
~38 GB/s (3.33 ms) — 8x the work, 100x the time, consistent with XLA
materializing the [F, K, d] gather to HBM above some size.  If so,
slicing the contraction into F-chunks (each below the threshold) should
recover the fast strategy at large batch.  Tests chunk sizes x dtypes,
plus an explicit f32-accumulate variant for bf16 tables.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


def contract(table, idx, w):
    return jnp.einsum("fk,fkd->fd", w, jnp.take(table, idx, axis=0))


def contract_f32(table, idx, w):
    rows = jnp.take(table, idx, axis=0).astype(jnp.float32)
    return jnp.einsum("fk,fkd->fd", w, rows)


@functools.partial(jax.jit, static_argnames=("chunk", "f32acc"))
def chunked(table, idx, w, chunk: int, f32acc: bool = False):
    f = idx.shape[0]
    assert f % chunk == 0
    idx_c = idx.reshape(f // chunk, chunk, idx.shape[1])
    w_c = w.reshape(f // chunk, chunk, w.shape[1])
    body = contract_f32 if f32acc else contract
    out = jax.lax.map(lambda iw: body(table, iw[0], iw[1]), (idx_c, w_c))
    return out.reshape(f, table.shape[1])


def main():
    n, d, k = 233_000, 128, 64
    f = 4096
    rng = np.random.default_rng(0)
    hist = rng.normal(size=(n + 1, d)).astype(np.float32)
    idx = jnp.asarray(rng.integers(0, n, size=(f, k)).astype(np.int32))
    w = jnp.asarray((rng.random((f, k)).astype(np.float32)) / k)

    log(f"devices={jax.devices()}  F={f} K={k} d={d} N={n}")
    for tag, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        table = jnp.asarray(hist, dtype=dt)
        ms = timeit(jax.jit(contract), table, idx, w)
        log(f"  [{tag}] monolithic             {ms:7.3f} ms")
        for chunk in (256, 512, 1024, 2048):
            ms = timeit(functools.partial(chunked, chunk=chunk),
                        table, idx, w)
            log(f"  [{tag}] chunk={chunk:<5d}           {ms:7.3f} ms")
        ms = timeit(functools.partial(chunked, chunk=512, f32acc=True),
                    table, idx, w)
        log(f"  [{tag}] chunk=512 f32acc       {ms:7.3f} ms")

    # also: does the fast small-F strategy survive under vmap/scan bodies?
    log("\nsmall-F control:")
    for tag, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        table = jnp.asarray(hist, dtype=dt)
        ms = timeit(jax.jit(contract), table, idx[:512], w[:512])
        log(f"  [{tag}] F=512 monolithic       {ms:7.3f} ms")


if __name__ == "__main__":
    main()
