"""Primitive-level A/B for the incremental aggregate table (ROADMAP item A,
VERDICT r3 item 2): maintain a-bar = A_full . h-bar as a persistent [N, d]
table so the CV full-neighborhood term becomes ONE [F, d] row gather,
paying instead an out-edge scatter-add on every history write.

Per training step the two designs cost:

  gather (current):  read  F_out * Dcap history rows   (+ einsum)
  table:             read  F_out rows of a-bar
                     + write Fin * Dcap_out delta contributions into a-bar
                       (Fin = input-field rows whose history changed)

The full term is ~90% of all row issues at the measured gather-issue bound
(PERF.md roofline), so this measures whether TPU scatter-add row issues are
cheap enough that trading F_out*Dcap gathers for Fin*Dcap_out scatters wins.
Reference full term: /root/reference/gcn/layers.py:355.

Run on the real chip from the repo root:  python scripts/profile_aggtable.py
"""
import sys, os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

N = 233_000
D = 128          # hidden width (bench recipe)
DCAP = 64        # padded in-degree (bench graph)
REPS = 200


def timeit(fn, *args, reps=REPS, donate=()):
    f = jax.jit(fn, donate_argnums=donate)
    if donate:
        # work on a private copy: donation consumes the caller's buffer
        args = (jnp.array(args[0], copy=True),) + args[1:]
    out = f(*args)
    # NOTE: block_until_ready does NOT wait for device completion through
    # the axon tunnel (a 119 MB read+write "timed" at 17 TB/s with it) —
    # only a VALUE fetch forces real synchronization, so the timing window
    # closes with a scalar fetch off the last output.
    _ = float(out.reshape(-1)[0])        # compile + first-fetch stall
    t0 = time.time()
    x = ((out,) + args[1:]) if donate else args   # warmup donated args[0]
    for _ in range(reps):
        out = f(*x)
        if donate:
            x = (out,) + x[1:]
    _ = float(out.reshape(-1)[0])        # force completion
    return (time.time() - t0) / reps * 1e3   # ms


def main():
    rng = np.random.default_rng(0)
    out = {}
    for hdtype in ("bfloat16", "float32"):
        h = jnp.asarray(rng.normal(size=(N + 1, D)).astype(np.float32)
                        ).astype(hdtype)
        atab = jnp.asarray(rng.normal(size=(N + 1, D)).astype(np.float32))
        for F in (512, 4096):
            fin = 2 * F
            nbr = jnp.asarray(rng.integers(0, N, size=(F, DCAP))
                              .astype(np.int32))
            w = jnp.asarray(rng.uniform(0, 1, size=(F, DCAP))
                            .astype(np.float32))
            field = jnp.asarray(rng.choice(N, F, replace=False)
                                .astype(np.int32))
            upd = jnp.asarray(rng.choice(N, fin, replace=False)
                              .astype(np.int32))
            out_ids = jnp.asarray(rng.integers(0, N, size=(fin, DCAP))
                                  .astype(np.int32))
            out_w = jnp.asarray(rng.uniform(0, 1, size=(fin, DCAP))
                                .astype(np.float32))
            delta = jnp.asarray(rng.normal(size=(fin, D))
                                .astype(np.float32)).astype(hdtype)

            def full_gather(h, nbr, w):
                rows = jnp.take(h, nbr, axis=0)
                return jnp.einsum("fk,fkd->fd", w,
                                  rows.astype(jnp.float32))

            def table_read(atab, field):
                return jnp.take(atab, field, axis=0)

            def maint_scatter(atab, out_ids, out_w, delta):
                contrib = (out_w[..., None]
                           * delta.astype(jnp.float32)[:, None, :])
                return atab.at[out_ids.reshape(-1)].add(
                    contrib.reshape(-1, D), mode="drop")

            def maint_scatter_bf16(atab, out_ids, out_w, delta):
                # contributions computed/stored bf16, accumulated f32
                contrib = (out_w[..., None].astype(jnp.bfloat16)
                           * delta.astype(jnp.bfloat16)[:, None, :])
                return atab.at[out_ids.reshape(-1)].add(
                    contrib.reshape(-1, D).astype(jnp.float32),
                    mode="drop")

            key = f"{hdtype}_F{F}"
            out[f"gather_ms_{key}"] = round(
                timeit(full_gather, h, nbr, w), 4)
            out[f"tableread_ms_{key}"] = round(
                timeit(table_read, atab, field), 4)
            out[f"maint_ms_{key}"] = round(
                timeit(maint_scatter, atab, out_ids, out_w, delta,
                       donate=(0,)), 4)
            out[f"maint16_ms_{key}"] = round(
                timeit(maint_scatter_bf16, atab, out_ids, out_w, delta,
                       donate=(0,)), 4)
            net = (out[f"gather_ms_{key}"] - out[f"tableread_ms_{key}"]
                   - out[f"maint_ms_{key}"])
            out[f"net_win_ms_{key}"] = round(net, 4)
            print(json.dumps({k: v for k, v in out.items() if key in k}),
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
