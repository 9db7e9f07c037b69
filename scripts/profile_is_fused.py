"""A/B the fused IS slot path (one packed [N+1, 2] gather — is_slots)
against the legacy per-slot element gathers (expand_importance) at Reddit
scale, both schedule-only and end-to-end.

Legacy here = production schedule() with the --is_row_table hoist DISABLED
but routed through expand_importance (the pre-fusion flow: membership
gather + inverse-weight gather + position gather, 3x F*Dcap element
gathers); the row-table variant is also timed for reference.

Run on the TPU: nohup python scripts/profile_is_fused.py > log 2>&1 &
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_reddit_like, HIDDEN, PAD_DEG
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data.graph import pad_csr
from stochastic_gcn_tpu.sampler import scheduler as S
from stochastic_gcn_tpu.training.loop import Trainer


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scan_time(fn, batch_matrix, args, steps):
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


def legacy_schedule(key, batch_ids, graph, importance, degree=1):
    """The pre-fusion IS schedule flow (expand_importance + pos gather)."""
    n = graph.num_nodes
    caps = S.field_capacities(batch_ids.shape[0], [degree], n,
                              graph.pad_degree, importance=True)
    field = batch_ids.astype(jnp.int32)
    nbr_id, slot_w, scales, sel_ids = S.expand_importance(
        key, graph, field, degree, importance)
    field_in, pos_table = S.compact_field(field, sel_ids, n, caps[0])
    slot_pos = pos_table[nbr_id]
    return field_in, slot_pos, slot_w, scales


def fused_schedule(key, batch_ids, graph, importance, degree=1):
    return S.schedule(key, graph, batch_ids, [degree], cv=False,
                      importance=importance)


def bm_ids(ds, batch, s, seed):
    r = np.random.default_rng(seed)
    ids = np.resize(r.permutation(ds.train_d).astype(np.int32), s * batch)
    return jnp.asarray(ids.reshape(s, batch))


def epoch_ms(tr, ds, batch, steps):
    tr.state, m = tr._train_epoch(tr.state, tr.graph_train,
                                  tr.train_features, tr.labels,
                                  tr.importance_train,
                                  bm_ids(ds, batch, steps, 1),
                                  tr._next_key())
    _ = float(m["loss"])
    t0 = time.time()
    tr.state, m = tr._train_epoch(tr.state, tr.graph_train,
                                  tr.train_features, tr.labels,
                                  tr.importance_train,
                                  bm_ids(ds, batch, steps, 2),
                                  tr._next_key())
    _ = float(m["loss"])
    return (time.time() - t0) / steps * 1e3


def main():
    log(f"devices={jax.devices()}")
    ds = build_reddit_like()
    g = pad_csr(ds.train_adj, PAD_DEG)
    imp = S.compute_importance(g)
    rng = np.random.default_rng(0)
    for batch in (512, 4096):
        steps = 120 if batch == 512 else 60
        ids = np.stack([rng.choice(ds.train_d, batch, replace=False)
                        for _ in range(steps)]).astype(np.int32)
        bmat = jnp.asarray(ids)
        print(f"--- batch {batch} (IS deg=1, schedule only) ---", flush=True)
        for name, fn in (("fused (production)", fused_schedule),
                         ("legacy 3-gather", legacy_schedule)):
            ms = scan_time(fn, bmat, (g, imp), steps)
            print(f"  {name:24s} {ms:6.3f} ms/step", flush=True)
    # end-to-end: production (fused) vs --is_row_table (legacy flow)
    for batch, steps in ((512, 200), (4096, 60)):
        print(f"--- batch {batch} (IS+PP deg=1, end-to-end) ---", flush=True)
        for name, over in (("fused (production)", dict()),
                           ("row-table legacy", dict(is_row_table=True))):
            cfg = Config(dataset="reddit_like", batch_size=batch, degree=1,
                         test_degree=1, cv=False, test_cv=False,
                         hidden1=HIDDEN, normalization="graphsage",
                         layer_norm=True, num_fc_layers=2,
                         weight_decay=0.0, dropout=0.2, importance=True,
                         pad_degree=PAD_DEG, seed=1, **over)
            tr = Trainer(cfg, ds)
            ms = epoch_ms(tr, ds, batch, steps)
            print(f"  {name:24s} {ms:7.3f} ms/step", flush=True)
            del tr


if __name__ == "__main__":
    main()
