"""Edge-list vs padded graph layout on a power-law (Zipf-degree) graph.

The padded layout pays F * max_degree gather rows for the CV
full-neighborhood term; the edge-list layout pays ~F * mean_degree.  On
power-law graphs (max >> mean) the edge-list should win both HBM and step
time.  Reports step ms and device graph bytes for both layouts."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
import scipy.sparse as sp
def log(*a): print(*a, file=sys.stderr, flush=True)
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data.graph import Dataset
from stochastic_gcn_tpu.data import preprocess as P
from stochastic_gcn_tpu.training.loop import Trainer

N = 100_000
FEAT = 128
CLS = 16
BATCH = 512

rng = np.random.default_rng(0)
# Zipf-ish degree sequence: most nodes degree ~2-8, hubs up to ~2000
deg = np.minimum((2.0 / rng.power(2.2, N)).astype(np.int64), 2000)
src = np.repeat(np.arange(N, dtype=np.int32), deg)
dst = rng.integers(0, N, size=src.shape[0], dtype=np.int32)
keep = src != dst
edges = np.stack([src[keep], dst[keep]], 1)
adj01 = (P.adj_from_edges(edges, N) > 0).astype(np.float32)
full_adj = P.graphsage_normalize_adj(adj01)
d = np.diff(full_adj.indptr)
log(f"graph: N={N} E={full_adj.nnz} mean_deg={d.mean():.1f} "
    f"max_deg={d.max()}")

feats = rng.normal(size=(N, FEAT)).astype(np.float32)
labels = np.zeros((N, CLS), np.float32)
labels[np.arange(N), rng.integers(0, CLS, N)] = 1
perm = rng.permutation(N).astype(np.int32)
train_d = np.sort(perm[:N // 2])
val_d = np.sort(perm[N // 2:N // 2 + N // 4])
test_d = np.sort(perm[N // 2 + N // 4:])
train_feats = full_adj.dot(feats)
ds = Dataset(num_data=N, train_adj=full_adj, full_adj=full_adj,
             feats=feats, train_feats=train_feats, test_feats=train_feats,
             labels=labels, train_d=train_d, val_d=val_d, test_d=test_d)

STEPS = 200
def bm(steps):
    ids = np.resize(rng.permutation(train_d), steps * BATCH).astype(np.int32)
    return jnp.asarray(ids.reshape(steps, BATCH))

def run(tag, **kw):
    cfg = Config(dataset="powerlaw", batch_size=BATCH, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=64,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2, seed=1,
                 **kw)
    t0 = time.time(); tr = Trainer(cfg, ds)
    g = tr.graph_train
    if hasattr(g, "idx"):
        gbytes = (g.bstart.nbytes + g.idx.nbytes + g.w.nbytes
                  + g.deg.nbytes)
    else:
        gbytes = g.nbr.nbytes + g.w.nbytes + g.deg.nbytes
    tr.state, m = tr._train_epoch(
        tr.state, tr.graph_train, tr.train_features, tr.labels,
        tr.importance_train, bm(STEPS), tr._next_key())
    _ = float(m["loss"])
    log(f"{tag}: build+warm {time.time()-t0:.1f}s graph={gbytes/1e6:.0f} MB")
    t0 = time.time()
    tr.state, m = tr._train_epoch(
        tr.state, tr.graph_train, tr.train_features, tr.labels,
        tr.importance_train, bm(STEPS), tr._next_key())
    amt = int(m["amt_data"])
    dt = time.time() - t0
    log(f"{tag}: {1000*dt/STEPS:.3f} ms/step loss={float(m['loss']):.3f} "
        f"amt={amt}")
    del tr

run("edgelist", graph_format="edgelist", fadj_edge_mult=8.0)
run("padded")
