import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
if len(sys.argv) > 1 and sys.argv[1] == "rbg":
    jax.config.update("jax_default_prng_impl", "rbg")
def log(*a): print(*a, file=sys.stderr, flush=True)
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer
from bench import build_reddit_like, BATCH, HIDDEN, PAD_DEG
ds = build_reddit_like()
cfg = Config(dataset="reddit_like", batch_size=BATCH, degree=1, test_degree=1,
             cv=True, test_cv=True, hidden1=HIDDEN, normalization="graphsage",
             layer_norm=True, num_fc_layers=2, weight_decay=0.0, dropout=0.2,
             pad_degree=PAD_DEG, seed=1)
tr = Trainer(cfg, ds)
STEPS=400
rng = np.random.default_rng(0)
ids = rng.permutation(ds.train_d)[:STEPS*BATCH//2].astype(np.int32)
bmx = jnp.asarray(np.resize(ids, STEPS*BATCH).reshape(STEPS, BATCH))
tr.state, m = tr._train_epoch(tr.state, tr.graph_train, tr.train_features,
                              tr.labels, tr.importance_train, bmx, jax.random.PRNGKey(0))
_ = float(m["loss"])
t0=time.time()
tr.state, m = tr._train_epoch(tr.state, tr.graph_train, tr.train_features,
                              tr.labels, tr.importance_train, bmx, jax.random.PRNGKey(1))
_ = float(m["loss"])
log(f"step: {1000*(time.time()-t0)/STEPS:.3f} ms")
