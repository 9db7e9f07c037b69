"""Ablate expand_importance piece by piece at batch 4096 to find the cost
that the scatter/top-k/compaction microbenches don't explain (IS schedule
9.0 ms vs uniform 1.3 while components sum to ~3.4 — profile_sched.py)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_reddit_like, PAD_DEG
from stochastic_gcn_tpu.data.graph import pad_csr, graph_rows
from stochastic_gcn_tpu.sampler import scheduler as S


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scan_time(fn, batch_matrix, args, steps=60):
    """Scan with PER-STEP batches (xs) — a constant batch lets XLA hoist
    any key-independent subcomputation (union masks, scores) out of the
    loop and fake the timing."""
    @jax.jit
    def run(bm, args):
        def body(c, xs):
            i, b = xs
            out = fn(jax.random.fold_in(jax.random.PRNGKey(0), i), b,
                     *args)
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


def make_expand(skip=()):
    def expand(key, graph, field_out, degree, importance, mesh=None,
               approx_topk=True, recall_target=0.95):
        n = graph.num_nodes
        dcap = graph.pad_degree
        f = field_out.shape[0]
        rows_nbr, rows_w, deg = graph_rows(graph, field_out, mesh)
        valid = (jnp.arange(dcap, dtype=jnp.int32)[None, :] < deg[:, None])

        if "union" in skip:
            union = jnp.ones(n + 1, bool).at[n].set(False)
        else:
            union = jnp.zeros(n + 1, bool).at[
                jnp.where(valid, rows_nbr, n)].set(True).at[n].set(False)
        total_imp = jnp.sum(jnp.where(union, importance, 0.0))

        f_true = jnp.sum(field_out < n)
        union_size = jnp.sum(union)
        n_samples = jnp.minimum(f_true * degree,
                                union_size).astype(jnp.float32)
        n_cap = min(f * degree, n)

        if "gumbel" in skip:
            score = jnp.where(union, jnp.log(importance), -jnp.inf)
        else:
            g = jax.random.gumbel(key, (n + 1,))
            score = jnp.where(union, jnp.log(importance) + g, -jnp.inf)
        if "topk" in skip:
            top_ids = jnp.arange(n_cap, dtype=jnp.int32)
        elif approx_topk:
            _, top_ids = jax.lax.approx_max_k(score, n_cap,
                                              recall_target=recall_target)
            top_ids = top_ids.astype(jnp.int32)
        else:
            _, top_ids = jax.lax.top_k(score, n_cap)
        rank_ok = jnp.arange(n_cap) < n_samples
        sel_ids = jnp.where(rank_ok & union[top_ids], top_ids, n)
        if "selected" in skip:
            tgt_sel = valid
        else:
            selected = jnp.zeros(n + 1, bool).at[sel_ids].set(True) \
                .at[n].set(False)
            tgt_sel = selected[rows_nbr] & valid

        if "inv" in skip:
            slot_w = jnp.where(tgt_sel, rows_w, 0.0)
        else:
            inv = total_imp / (importance[rows_nbr]
                               * jnp.maximum(n_samples, 1.0))
            slot_w = jnp.where(tgt_sel, rows_w * inv, 0.0)
        nbr_id = jnp.where(tgt_sel, rows_nbr, n)
        scales = jnp.ones((f,), jnp.float32)
        return nbr_id, slot_w, scales, sel_ids
    return expand


def main():
    log(f"devices={jax.devices()}")
    ds = build_reddit_like()
    g = pad_csr(ds.train_adj, PAD_DEG)
    imp = S.compute_importance(g)
    rng = np.random.default_rng(0)
    batch = 4096
    steps = 60
    bm = jnp.asarray(
        np.resize(rng.permutation(ds.train_d).astype(np.int32),
                  steps * batch).reshape(steps, batch))
    real = S.expand_importance
    variants = [("full approx", ()), ("full exact", ()),
                ("no union scatter", ("union",)),
                ("no gumbel", ("gumbel",)), ("no topk", ("topk",)),
                ("no selected/gather", ("selected",)),
                ("no inv weights", ("inv",)),
                ("skeleton (all skipped)",
                 ("union", "gumbel", "topk", "selected", "inv"))]
    try:
        for name, skip in variants:
            S.expand_importance = make_expand(skip)
            approx = name != "full exact"
            ms = scan_time(
                lambda k, b, i: S.schedule(k, g, b, (1,), cv=True,
                                           importance=i,
                                           is_approx_topk=approx),
                bm, (imp,), steps=steps)
            log(f"  {name:28s} {ms:7.3f} ms")
        S.expand_importance = real
        ms = scan_time(
            lambda k, b: S.schedule(k, g, b, (1,), cv=True), bm, (),
            steps=steps)
        log(f"  {'uniform (same bm)':28s} {ms:7.3f} ms")
    finally:
        S.expand_importance = real


if __name__ == "__main__":
    main()
