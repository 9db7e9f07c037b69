"""Tier A/B on the block-aligned edgelist layout (100k-node Zipf graph,
batch 4096 so the TIER_MIN_ROWS gate engages).

On power-law graphs the flat-CSR window budget (~8x mean degree, 56 slots
here) still pads most rows heavily — Zipf median degree is ~3 — so the
two-tier term's narrow main window should cut the full-term history
gather much harder than on the near-uniform padded bench graph."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax.numpy as jnp

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data.graph import Dataset
from stochastic_gcn_tpu.data import preprocess as P
from stochastic_gcn_tpu.training.loop import Trainer


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N, FEAT, CLS, BATCH, STEPS = 100_000, 128, 16, 4096, 100

rng = np.random.default_rng(0)
deg = np.minimum((2.0 / rng.power(2.2, N)).astype(np.int64), 2000)
src = np.repeat(np.arange(N, dtype=np.int32), deg)
dst = rng.integers(0, N, size=src.shape[0], dtype=np.int32)
keep = src != dst
edges = np.stack([src[keep], dst[keep]], 1)
full_adj = P.graphsage_normalize_adj(
    (P.adj_from_edges(edges, N) > 0).astype(np.float32))
d = np.diff(full_adj.indptr)
log(f"graph: N={N} E={full_adj.nnz} mean={d.mean():.1f} "
    f"median={np.median(d):.0f} max={d.max()}")

feats = rng.normal(size=(N, FEAT)).astype(np.float32)
labels = np.zeros((N, CLS), np.float32)
labels[np.arange(N), rng.integers(0, CLS, N)] = 1
perm = rng.permutation(N).astype(np.int32)
train_d = np.sort(perm[:N // 2])
train_feats = full_adj.dot(feats)
ds = Dataset(num_data=N, train_adj=full_adj, full_adj=full_adj,
             feats=feats, train_feats=train_feats, test_feats=train_feats,
             labels=labels, train_d=train_d,
             val_d=np.sort(perm[N // 2:3 * N // 4]),
             test_d=np.sort(perm[3 * N // 4:]))


def bm():
    ids = np.resize(rng.permutation(train_d), STEPS * BATCH)
    return jnp.asarray(ids.astype(np.int32).reshape(STEPS, BATCH))


def run(tag, **kw):
    cfg = Config(dataset="zipf", batch_size=BATCH, degree=1, test_degree=1,
                 cv=True, test_cv=True, hidden1=64,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2, seed=1,
                 graph_format="edgelist", fadj_edge_mult=8.0, **kw)
    tr = Trainer(cfg, ds)
    g = tr.graph_train
    log(f"{tag}: window={min(g.edge_cap_per_row, g.max_degree)} "
        f"tier_w={g.tier_w} tier_frac={g.tier_frac:.4f}")
    tr.state, m = tr._train_epoch(
        tr.state, tr.graph_train, tr.train_features, tr.labels,
        tr.importance_train, bm(), tr._next_key())
    _ = float(m["loss"])
    best = []
    for _ in range(3):
        t0 = time.time()
        tr.state, m = tr._train_epoch(
            tr.state, tr.graph_train, tr.train_features, tr.labels,
            tr.importance_train, bm(), tr._next_key())
        _ = float(m["loss"])
        best.append((time.time() - t0) / STEPS * 1000)
    log(f"{tag}: " + " ".join(f"{b:.3f}" for b in best)
        + f" ms/step (min {min(best):.3f}) loss={float(m['loss']):.3f}")
    del tr
    return min(best)


off = run("edgelist tier OFF", fadj_tier=False)
on = run("edgelist tier ON ", fadj_tier=True)
log(f"==> edgelist zipf batch {BATCH}: {off:.3f} -> {on:.3f} ms/step "
    f"({off / on:.2f}x)")
