import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, file=sys.stderr, flush=True)
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer
from bench import build_reddit_like, BATCH, HIDDEN, PAD_DEG
ds = build_reddit_like()
base = dict(dataset="reddit_like", batch_size=BATCH, degree=1, test_degree=1,
            cv=True, test_cv=True, hidden1=HIDDEN, normalization="graphsage",
            layer_norm=True, num_fc_layers=2, weight_decay=0.0, dropout=0.2,
            pad_degree=PAD_DEG, seed=1)
STEPS=300
rng = np.random.default_rng(0)
def run(tag, **kw):
    cfg = Config(**{**base, **kw})
    tr = Trainer(cfg, ds)
    ids = rng.permutation(ds.train_d)[:STEPS*BATCH].astype(np.int32)
    bmx = jnp.asarray(ids.reshape(STEPS, BATCH))
    tr.state, m = tr._train_epoch(tr.state, tr.graph_train, tr.train_features,
                                  tr.labels, tr.importance_train, bmx, jax.random.PRNGKey(0))
    _ = float(m["loss"])
    t0=time.time()
    tr.state, m = tr._train_epoch(tr.state, tr.graph_train, tr.train_features,
                                  tr.labels, tr.importance_train, bmx, jax.random.PRNGKey(1))
    _ = float(m["loss"])
    log(f"{tag}: {1000*(time.time()-t0)/STEPS:.3f} ms/step, loss {float(m['loss']):.4f}")
run("default        ")
run("bf16 history   ", history_dtype="bfloat16")
run("pallas f32 fadj", use_pallas=True)
