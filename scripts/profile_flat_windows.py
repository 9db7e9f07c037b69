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
  aligned    rows pre-aligned to B boundaries at build time: gather
             ceil(W/B) whole blocks per row, NO compaction (extra slots
             masked downstream) — the production candidate
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


def blockrow(flat, starts, W, blk=B):
    nb = W // blk + 2                    # blocks covering any alignment
    tab = flat.reshape(-1, blk)          # [E/B, B]
    b0 = starts // blk
    bids = b0[:, None] + jnp.arange(nb, dtype=jnp.int32)[None, :]
    rows = jnp.take(tab, bids, axis=0)   # [F, nb, B]
    wide = rows.reshape(rows.shape[0], nb * blk)
    off = (starts % blk)[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    return jnp.take_along_axis(wide, off, axis=1)


def aligned(flat, bstarts, W, blk=B):
    """Rows pre-aligned to block boundaries: bstarts are BLOCK indices.
    Output is [F, ceil(W/B)*B] — wider than W, extra slots carry whatever
    padding the build wrote (masked downstream by deg), zero compaction."""
    nb = -(-W // blk)
    tab = flat.reshape(-1, blk)
    bids = bstarts[:, None] + jnp.arange(nb, dtype=jnp.int32)[None, :]
    rows = jnp.take(tab, bids, axis=0)   # [F, nb, B]
    return rows.reshape(rows.shape[0], nb * blk)


def main():
    rng = np.random.default_rng(0)
    e_pad = -(-E // 128) * 128 + 512     # block-divisible + window slack
    flat = jnp.asarray(rng.normal(size=(e_pad,)).astype(np.float32))
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
        for blk in (8, 16, 128):
            ms = bench(partial(blockrow, W=W, blk=blk), flat, starts)
            log(f"  blockrow B={blk:<4} {ms:7.3f} ms")
        for blk in (8, 16, 128):
            bstarts = jnp.asarray(
                (np.asarray(starts) // blk).astype(np.int32))
            ms = bench(partial(aligned, W=W, blk=blk), flat, bstarts)
            log(f"  aligned  B={blk:<4} {ms:7.3f} ms  "
                f"(slots {-(-W // blk) * blk})")
        ms = bench(lambda t, r: jnp.take(t, r, axis=0), tab, rows)
        log(f"  padded-take {ms:7.3f} ms")
        # aligned + the downstream [F, slots, d] hist row gather it feeds,
        # to see the end-to-end tradeoff of the widened slot count
        hist = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
        for blk in (8, 128):
            slots = -(-W // blk) * blk
            bstarts = jnp.asarray(
                (np.asarray(starts) // blk).astype(np.int32))

            def end2end(flat_, bs, hist_, blk=blk, slots=slots):
                win = aligned(flat_, bs, W, blk=blk)
                ids = (win.astype(jnp.int32) % N)
                rws = jnp.take(hist_, ids, axis=0)
                return jnp.einsum("fk,fkd->fd", win, rws)
            ms = bench(end2end, flat, bstarts, hist)
            log(f"  aligned+hist B={blk:<4} {ms:7.3f} ms (slots {slots})")
        def end2end_dyn(flat_, s, hist_):
            win = dynslice(flat_, s, W)
            ids = (win.astype(jnp.int32) % N)
            rws = jnp.take(hist_, ids, axis=0)
            return jnp.einsum("fk,fkd->fd", win, rws)
        ms = bench(end2end_dyn, flat, starts, hist)
        log(f"  dynslice+hist     {ms:7.3f} ms (slots {W})")
    # element gather of k=1 chosen slots (the offset-sampling candidate)
    off1 = jnp.asarray(rng.integers(0, 40, size=(F,)).astype(np.int32))
    ms = bench(lambda f_, s, o: jnp.take(f_, s + o, axis=0),
               flat, starts, off1)
    log(f"  k=1 offset element gather {ms:7.3f} ms")


if __name__ == "__main__":
    main()
