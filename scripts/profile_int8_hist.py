"""Primitive A/B: int8-quantized history rows for the CV full-neighborhood
term vs bf16/f32, at bench shapes (N=233k, Dcap=64, d=128).

Premise: the [F, Dcap] history-row gather (the step's dominant cost) is
byte-size-sensitive on this hardware — bf16 measured ~3.8x faster than
f32 at identical row counts (PERF.md round-4 aggtable table) — so
halving row bytes again with int8 may buy more.  CV tolerates ANY stored
h-bar exactly (Z = A_samp(H - h) + A_full.h is unbiased for any h; a
quantized anchor only adds variance), which makes histories uniquely
safe to quantize.  Design under test: PER-COLUMN scales s[d] (out =
einsum(w, q).astype * s — the scale factors out of the contraction, so
no extra gathers at all), dequant fused into the einsum operand read.

Protocol: ops timed inside a lax.scan with per-iteration index
perturbation (standalone dispatch through the tunnel costs ~0.3-0.8 ms),
closed with a VALUE fetch.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

ITERS = 50
N, DCAP, D = 233_001, 64, 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scan_time(name, op, *args):
    def f(*a):
        def body(c, _):
            r = op(c, *a)
            return c + 1, r.sum()
        return jax.lax.scan(body, 0, None, length=ITERS)[1].sum()

    jf = jax.jit(f)
    _ = float(jf(*args))          # compile + first-fetch
    t0 = time.time()
    _ = float(jf(*args))
    dt = 1000 * (time.time() - t0) / ITERS
    log(f"{name}: {dt:.3f} ms/op")
    return dt


def main():
    rng = np.random.default_rng(0)
    hist = rng.normal(size=(N, D)).astype(np.float32)
    scale = (np.abs(hist).max(0) / 127.0).astype(np.float32)
    hist_q = np.clip(np.round(hist / scale), -127, 127).astype(np.int8)
    h32 = jnp.asarray(hist)
    h16 = jnp.asarray(hist, jnp.bfloat16)
    hq = jnp.asarray(hist_q)
    s = jnp.asarray(scale)

    for F in (1024, 8192):
        fnbr = jnp.asarray(
            rng.integers(0, N, size=(F, DCAP)).astype(np.int32))
        fw = jnp.asarray(rng.uniform(0, 1, size=(F, DCAP)).astype(np.float32))
        log(f"--- F={F} (Dcap={DCAP}, d={D}) ---")

        def full_f32(c, h, nbr, w):
            rows = jnp.take(h, (nbr + c) % N, axis=0)
            return jnp.einsum("fk,fkd->fd", w, rows)

        def full_bf16(c, h, nbr, w):
            rows = jnp.take(h, (nbr + c) % N, axis=0)
            return jnp.einsum("fk,fkd->fd", w, rows)

        def full_int8(c, h, nbr, w, s_):
            rows = jnp.take(h, (nbr + c) % N, axis=0)       # int8 bytes
            out = jnp.einsum("fk,fkd->fd", w,
                             rows.astype(jnp.bfloat16))
            return out * s_[None, :]

        t32 = scan_time("f32 rows ", full_f32, h32, fnbr, fw)
        t16 = scan_time("bf16 rows", full_bf16, h16, fnbr, fw)
        t8 = scan_time("int8 rows", full_int8, hq, fnbr, fw, s)
        log(f"==> F={F}: f32 {t32:.3f} / bf16 {t16:.3f} / int8 {t8:.3f} "
            f"ms  (int8 {t16 / t8:.2f}x vs bf16)")

    # quantization error magnitude for the record
    deq = hist_q.astype(np.float32) * scale
    rel = np.abs(deq - hist).max() / np.abs(hist).max()
    log(f"max abs quant err / absmax: {rel:.5f}")


if __name__ == "__main__":
    main()
