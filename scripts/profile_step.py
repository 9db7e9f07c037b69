import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, file=sys.stderr, flush=True)
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer
from bench import build_reddit_like, BATCH, HIDDEN, PAD_DEG
t0=time.time(); ds = build_reddit_like(); log("loaded", time.time()-t0)
cfg = Config(dataset="reddit_like", batch_size=BATCH, degree=1, test_degree=1,
             cv=True, test_cv=True, hidden1=HIDDEN, normalization="graphsage",
             layer_norm=True, num_fc_layers=2, weight_decay=0.0, dropout=0.2,
             pad_degree=PAD_DEG, seed=1)
t0=time.time(); tr = Trainer(cfg, ds); log("trainer", time.time()-t0)

from stochastic_gcn_tpu.sampler.scheduler import schedule
batch = jnp.asarray(np.arange(BATCH, dtype=np.int32))

t0=time.time()
f = jax.jit(lambda g, k: schedule(k, g, batch, (1,), True))
r = f(tr.graph_train, jax.random.PRNGKey(0)); jax.block_until_ready(r); log("schedule compile", time.time()-t0)
t0=time.time()
for i in range(20): r = f(tr.graph_train, jax.random.PRNGKey(i))
jax.block_until_ready(r); log("schedule ms/it", (time.time()-t0)/20*1000)

st = tr.state
t0=time.time()
st, m = tr._train_step(st, tr.graph_train, tr.train_features, tr.labels, tr.importance_train, batch, jax.random.PRNGKey(0))
jax.block_until_ready(m["loss"]); log("step compile+1", time.time()-t0)
t0=time.time()
for i in range(20):
    st, m = tr._train_step(st, tr.graph_train, tr.train_features, tr.labels, tr.importance_train, batch, jax.random.PRNGKey(i))
jax.block_until_ready(m["loss"]); log("train step ms/it", (time.time()-t0)/20*1000)

# eval step timing too
eh = tr.eval_histories
t0=time.time()
mm, eh = tr._eval_step(tr.state.params if hasattr(tr.state,'params') else st.params, eh, tr.graph_full, tr.test_features, tr.labels, tr.importance_test, batch, jax.random.PRNGKey(0))
jax.block_until_ready(mm["loss"]); log("eval compile+1", time.time()-t0)
t0=time.time()
for i in range(10):
    mm, eh = tr._eval_step(st.params, eh, tr.graph_full, tr.test_features, tr.labels, tr.importance_test, batch, jax.random.PRNGKey(i))
jax.block_until_ready(mm["loss"]); log("eval ms/it", (time.time()-t0)/10*1000)
