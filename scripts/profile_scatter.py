"""History-scatter cost decomposition (axon-safe epoch-scan timing).

The residual ablation (profile_residual.py) attributes ~1.0 ms/step
(batch 4096, f32) to the history scatter — ~8k row-writes of 512 B
should cost ~5 us at HBM bandwidth, so the cost is suspected to be a
whole-buffer copy: inside a lax.scan body XLA only updates a carried
buffer in place if buffer assignment can prove the scatter's operand
dies, and the gathers earlier in the step may defeat that.

Variants: baseline .at[ids].set, unique_indices / indices_are_sorted
hints, scatter-add, a contiguous dynamic-update-slice control (always
in-place in scan bodies), and no-scatter control.  All run S steps inside
one jitted scan with iteration-dependent ids and a carried checksum.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scan_time(body, table0, steps):
    @jax.jit
    def run(table):
        (table, c), _ = jax.lax.scan(
            body, (table, jnp.zeros((), jnp.float32)),
            jnp.arange(steps, dtype=jnp.int32))
        return c + table[0, 0]

    c = run(table0)
    _ = float(c)
    t0 = time.time()
    c = run(table0)
    _ = float(c)
    return (time.time() - t0) / steps * 1e3


def main():
    n, d, c = 233_000, 128, 8192
    steps = 200
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    ids0 = jnp.asarray(
        rng.permutation(n)[:c].astype(np.int32))

    for tag, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        table0 = jnp.zeros((n + 1, d), dt)
        rows_t = rows.astype(dt)

        def ids_at(i):
            # iteration-dependent, still unique: shift the permutation
            return (ids0 + i) % n

        def mk(kind):
            def body(carry, i):
                table, cs = carry
                ids = ids_at(i)
                if kind == "set":
                    table = table.at[ids].set(rows_t)
                elif kind == "set_unique":
                    table = table.at[ids].set(rows_t, unique_indices=True)
                elif kind == "set_unique_sorted":
                    sids = jnp.sort(ids)
                    table = table.at[sids].set(rows_t, unique_indices=True,
                                               indices_are_sorted=True)
                elif kind == "add_unique":
                    table = table.at[ids].add(rows_t, unique_indices=True)
                elif kind == "dus":
                    off = (i * 64) % (n - c)
                    table = jax.lax.dynamic_update_slice(
                        table, rows_t, (off, 0))
                elif kind == "none":
                    pass
                cs = cs + jnp.sum(rows_t[0].astype(jnp.float32)) \
                    + jnp.float32(ids[0])
                return (table, cs), ()
            return body

        for kind in ("none", "set", "set_unique", "set_unique_sorted",
                     "add_unique", "dus"):
            ms = scan_time(mk(kind), table0, steps)
            log(f"  [{tag}] {kind:<18s} {ms:7.3f} ms/step")


if __name__ == "__main__":
    main()
