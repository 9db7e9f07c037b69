"""Knock-out ablation of the UNIFORM CV deg-1 schedule (the headline
config's scheduler share: ~0.25 ms of the 0.554 ms step at batch 512,
~1.4 of 3.16 at 4096 — PERF.md roofline section).  Which of
compact_field's pieces carries the cost: the O(N) scatters, the O(N)
cumsum, or the rank->id binary search (searchsorted does ~log2(N)=18
dependent element gathers per rank, i.e. ~18*F issue-bound lookups)?

Per-step batch matrices as scan xs (constant batches let XLA hoist
key-independent work and fake the numbers — see profile_is_ablate.py).
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


def scan_time(fn, batch_matrix, args, steps=120):
    @jax.jit
    def run(bm, args):
        def body(c, xs):
            i, b = xs
            out = fn(jax.random.fold_in(jax.random.PRNGKey(0), i), b, *args)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            (jnp.arange(steps), bm))
        return c
    _ = float(run(batch_matrix, args))
    t0 = time.time()
    _ = float(run(batch_matrix, args))
    return (time.time() - t0) / steps * 1e3


def compact_ablate(field_out, new_ids, num_nodes, capacity, skip):
    n = num_nodes
    f = field_out.shape[0]
    arange_f = jnp.arange(f, dtype=jnp.int32)
    if "scatters" in skip:
        pos_table = jnp.zeros(n + 1, jnp.int32)
        new_mask = jnp.zeros(n + 1, bool).at[0].set(True)
    else:
        pos_table = jnp.zeros(n + 1, jnp.int32).at[field_out].set(arange_f)
        seen = jnp.zeros(n + 1, bool).at[field_out].set(True).at[n].set(True)
        occurs = jnp.zeros(n + 1, bool).at[new_ids.reshape(-1)].set(True)
        new_mask = occurs & ~seen
    if "cumsum" in skip:
        cum = jnp.arange(n + 1, dtype=jnp.int32)
    else:
        cum = jnp.cumsum(new_mask.astype(jnp.int32))
    pos_table = jnp.where(new_mask, f + cum - 1, pos_table)
    if "searchsorted" in skip:
        new_by_rank = jnp.zeros(capacity - f, jnp.int32)
    else:
        ranks = jnp.arange(1, capacity - f + 1, dtype=cum.dtype)
        new_by_rank = jnp.searchsorted(cum, ranks,
                                       side="left").astype(jnp.int32)
        new_by_rank = jnp.minimum(new_by_rank, n)
    field_in = jnp.concatenate([field_out, new_by_rank])
    return field_in, pos_table


def make_schedule(skip=(), degree=1):
    def sched(key, batch_ids, graph):
        n = graph.num_nodes
        caps = S.field_capacities(batch_ids.shape[0], [degree], n,
                                  graph.pad_degree)
        field = batch_ids.astype(jnp.int32)
        nbr_id, slot_w, slot_aw, scales = S.expand_uniform(
            key, graph, field, degree, False)
        if "compact" in skip:
            field_in = jnp.concatenate(
                [field, jnp.full((caps[0] - field.shape[0],), n, jnp.int32)])
            pos_table = jnp.zeros(n + 1, jnp.int32)
        else:
            field_in, pos_table = compact_ablate(field, nbr_id, n, caps[0],
                                                 skip)
        if "slotpos" in skip:
            slot_pos = nbr_id
        else:
            slot_pos = pos_table[nbr_id]
        return field_in, slot_pos, slot_w, scales
    return sched


def main():
    log(f"devices={jax.devices()}")
    ds = build_reddit_like()
    g = pad_csr(ds.train_adj, PAD_DEG)
    rng = np.random.default_rng(0)
    for batch in (512, 4096):
        steps = 120 if batch == 512 else 60
        ids = np.stack([rng.choice(ds.train_d, batch, replace=False)
                        for _ in range(steps)]).astype(np.int32)
        bm = jnp.asarray(ids)
        print(f"--- batch {batch} (uniform deg=1 CV schedule) ---",
              flush=True)
        # production schedule() — current compact_field (candidate-scatter
        # rank inversion); the local "full" copy below keeps the OLD
        # searchsorted inversion for A/B
        prod = lambda key, b, graph: S.schedule(  # noqa: E731
            key, graph, b, [1], cv=True)
        ms = scan_time(prod, bm, (g,), steps)
        print(f"  {'production schedule()':28s} {ms:6.3f} ms/step",
              flush=True)
        # production no-dedup layout (--nofield_dedup): append_field, no
        # O(N) compaction at all — the shipping version of this ablation
        nd = lambda key, b, graph: S.schedule(  # noqa: E731
            key, graph, b, [1], cv=True, dedup=False)
        ms = scan_time(nd, bm, (g,), steps)
        print(f"  {'production no-dedup':28s} {ms:6.3f} ms/step",
              flush=True)
        for name, skip in (
                ("full", ()),
                ("no searchsorted", ("searchsorted",)),
                ("no cumsum", ("cumsum",)),
                ("no O(N) scatters", ("scatters",)),
                ("no slot_pos lookup", ("slotpos",)),
                ("expand only (no compact)", ("compact", "slotpos")),
        ):
            ms = scan_time(make_schedule(skip), bm, (g,), steps)
            print(f"  {name:28s} {ms:6.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
