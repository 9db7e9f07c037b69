"""Benchmark Pallas kernels vs the XLA gather+einsum paths on TPU, at the
bench config's shapes (CV+PP Reddit-like: Dcap=128 full-neighborhood slots,
d=128 history width).

Ops are timed inside a lax.scan (per-iteration index perturbation prevents
hoisting) because standalone dispatch through the axon tunnel costs ~0.8 ms
and swamps the op itself.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from stochastic_gcn_tpu.ops import pallas_spmm as PS

ITERS = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scan_time(name, op, table, idx, w, n):
    def f(table, idx, w):
        def body(c, _):
            idx2 = (idx + c) % n
            r = op(table, idx2, w)
            return c + 1, r.sum()
        return jax.lax.scan(body, 0, None, length=ITERS)[1].sum()

    jf = jax.jit(f)
    r = jf(table, idx, w)
    jax.block_until_ready(r)
    _ = float(r)
    t0 = time.time()
    r = jf(table, idx, w)
    _ = float(r)
    log(f"{name}: {1000*(time.time()-t0)/ITERS:.3f} ms/op")


def main():
    rng = np.random.default_rng(0)
    n, d = 233_001, 128
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    for f, k, tag in [(1024, 128, "fadj F=1024 Dcap=128 (67MB/op)"),
                      (4096, 128, "fadj F=4096 Dcap=128 (268MB/op)")]:
        idx = jnp.asarray(rng.integers(0, n, (f, k)).astype(np.int32))
        w = jnp.asarray(rng.random((f, k)).astype(np.float32))
        log(f"--- {tag}")
        # numerical check once, against float64 ground truth (XLA's default-
        # precision einsum reduces in bf16 passes and is itself inexact)
        try:
            truth = np.einsum(
                "fk,fkd->fd", np.asarray(w, np.float64),
                np.asarray(table)[np.asarray(idx)].astype(np.float64))
            a = PS.hbm_gather_aggregate_xla(table, idx, w)
            b = PS.hbm_gather_aggregate(table, idx, w)
            log(f"  xla  vs f64: {np.abs(np.asarray(a)-truth).max():.2e}")
            log(f"  plls vs f64: {np.abs(np.asarray(b)-truth).max():.2e}")
        except Exception as e:
            log(f"  pallas failed: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:150]}")
            continue
        scan_time("  xla ", PS.hbm_gather_aggregate_xla, table, idx, w, n)
        scan_time("  plls", lambda t, i, ww: PS.hbm_gather_aggregate(
            t, i, ww), table, idx, w, n)

    c = 1024
    x = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    for f, k in [(512, 1), (512, 20)]:
        pos = jnp.asarray(rng.integers(0, c, (f, k)).astype(np.int32))
        w = jnp.asarray(rng.random((f, k)).astype(np.float32))
        log(f"--- fanout F={f} k={k}")
        try:
            a = PS.fanout_aggregate_xla(x, pos, w)
            b = PS.fanout_aggregate(x, pos, w)
            log(f"  max err {float(jnp.max(jnp.abs(a - b))):.2e}")
        except Exception as e:
            log(f"  pallas failed: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:150]}")
            continue
        scan_time("  xla ", PS.fanout_aggregate_xla, x, pos, w, c)
        scan_time("  plls", lambda t, i, ww: PS.fanout_aggregate(t, i, ww),
                  x, pos, w, c)


if __name__ == "__main__":
    main()
