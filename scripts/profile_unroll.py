"""Measure --scan_unroll on the bench config (real TPU).

Epoch = 300-step lax.scan; reports ms/step per unroll factor."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, file=sys.stderr, flush=True)
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer
from bench import build_reddit_like, BATCH, HIDDEN, PAD_DEG

t0 = time.time(); ds = build_reddit_like(); log("loaded", time.time() - t0)
rng = np.random.default_rng(0)
STEPS = 300

def batch_matrix(steps):
    ids = rng.permutation(ds.train_d)[:steps * BATCH].astype(np.int32)
    return jnp.asarray(ids.reshape(steps, BATCH))

for unroll in (1, 2, 4):
    cfg = Config(dataset="reddit_like", batch_size=BATCH, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=HIDDEN,
                 normalization="graphsage", layer_norm=True, num_fc_layers=2,
                 weight_decay=0.0, dropout=0.2, pad_degree=PAD_DEG, seed=1,
                 scan_unroll=unroll)
    t0 = time.time(); tr = Trainer(cfg, ds)
    tr.state, m = tr._train_epoch(
        tr.state, tr.graph_train, tr.train_features, tr.labels,
        tr.importance_train, batch_matrix(STEPS), tr._next_key())
    _ = float(m["loss"])
    log(f"unroll={unroll} build+compile+warm {time.time()-t0:.1f}s")
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        tr.state, m = tr._train_epoch(
            tr.state, tr.graph_train, tr.train_features, tr.labels,
            tr.importance_train, batch_matrix(STEPS), tr._next_key())
    _ = float(m["loss"])
    dt = time.time() - t0
    log(f"unroll={unroll}: {1000*dt/(reps*STEPS):.3f} ms/step "
        f"({m['amt_data']})")
    del tr
