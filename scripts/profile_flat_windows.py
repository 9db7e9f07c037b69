"""Microbench: ways to materialize [F, W] row windows from a flat CSR
array on TPU, at the Zipf-bench shapes (E~650k, F=1024, W=293 sampler /
W=52 full-term).  Hypothesis (PERF round 3): vmap(dynamic_slice) on a 1-D
array lowers to per-ELEMENT gathers (F*W issues), not per-slice — that
would explain the edgelist step's 3x gap vs padded (whose [N, Dcap]
jnp.take pays F ROW issues).

Variants:
  dynslice   vmap(lax.dynamic_slice)(starts)          — current production
  elemgather take(flat, start[:,None]+arange(W))      — explicit elements
  blockrow   reshape flat -> [E/B, B], take block rows covering each
             window, then take_along_axis locally      — row-issue path
  padded     jnp.take on a padded [N, W] table         — the comparator
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def log(*a):
    print(*a, file=sys.stderr, flush=True)


E = 650_000
N = 100_000
F = 1024
B = 16


def bench(fn, *args, steps=200):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps * 1e3


def dynslice(flat, starts, W):
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(flat, (s,), (W,)))(starts)


def elemgather(flat, starts, W):
    idx = starts[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    return jnp.take(flat, idx, axis=0)


def blockrow(flat, starts, W):
    nb = W // B + 2                      # blocks covering any alignment
    tab = flat.reshape(-1, B)            # [E/B, B]
    b0 = starts // B
    bids = b0[:, None] + jnp.arange(nb, dtype=jnp.int32)[None, :]
    rows = jnp.take(tab, bids, axis=0)   # [F, nb, B]
    wide = rows.reshape(rows.shape[0], nb * B)
    off = (starts % B)[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    return jnp.take_along_axis(wide, off, axis=1)


def main():
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.normal(size=(E,)).astype(np.float32))
    starts = jnp.asarray(
        rng.integers(0, E - 512, size=(F,)).astype(np.int32))
    padded_w = {}
    for W in (293, 52):
        tab = jnp.asarray(
            rng.normal(size=(N, W)).astype(np.float32))
        rows = jnp.asarray(rng.integers(0, N, size=(F,)).astype(np.int32))
        log(f"--- W={W}")
        # correctness of blockrow vs dynslice
        a = np.asarray(jax.jit(partial(dynslice, W=W))(flat, starts))
        c = np.asarray(jax.jit(partial(blockrow, W=W))(flat, starts))
        np.testing.assert_allclose(a, c)
        for name, fn in (("dynslice  ", partial(dynslice, W=W)),
                         ("elemgather", partial(elemgather, W=W)),
                         ("blockrow  ", partial(blockrow, W=W))):
            ms = bench(fn, flat, starts)
            log(f"  {name} {ms:7.3f} ms")
        ms = bench(lambda t, r: jnp.take(t, r, axis=0), tab, rows)
        log(f"  padded-take {ms:7.3f} ms")
    # element gather of k=1 chosen slots (the offset-sampling candidate)
    off1 = jnp.asarray(rng.integers(0, 40, size=(F,)).astype(np.int32))
    ms = bench(lambda f_, s, o: jnp.take(f_, s + o, axis=0),
               flat, starts, off1)
    log(f"  k=1 offset element gather {ms:7.3f} ms")


if __name__ == "__main__":
    main()
