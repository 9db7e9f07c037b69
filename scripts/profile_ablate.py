"""Ablation profile of the CV+PP train step on the bench config (TPU).

Times scan-amortized variants to attribute the per-step cost.  All device
buffers are passed as jit ARGUMENTS — closing over them embeds multi-hundred-
MB constants in the program and wrecks compile time.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

def log(*a):
    print(*a, file=sys.stderr, flush=True)

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer
from stochastic_gcn_tpu.models import gcn as M
from stochastic_gcn_tpu.sampler.scheduler import schedule
from bench import build_reddit_like, HIDDEN, PAD_DEG
import bench
# batch override for post-tier decompositions (SGT_ABLATE_BATCH=4096)
BATCH = int(os.environ.get("SGT_ABLATE_BATCH", bench.BATCH))

ds = build_reddit_like()
cfg = Config(dataset="reddit_like", batch_size=BATCH, degree=1, test_degree=1,
             cv=True, test_cv=True, hidden1=HIDDEN, normalization="graphsage",
             layer_norm=True, num_fc_layers=2, weight_decay=0.0, dropout=0.2,
             pad_degree=PAD_DEG, seed=1)
tr = Trainer(cfg, ds)
log("trainer ready")
n = ds.num_data
spec = tr.train_spec
degrees = tr.train_degrees
rng = np.random.default_rng(0)
STEPS = 200

def bm():
    # np.resize recycles train ids when STEPS*BATCH exceeds the train set
    # (batches stay duplicate-free WITHIN a step, all the scheduler needs)
    ids = np.resize(rng.permutation(ds.train_d).astype(np.int32),
                    STEPS * BATCH)
    return jnp.asarray(ids.reshape(STEPS, BATCH))

def timed(name, fn, *args, absorb=False):
    f = jax.jit(fn)
    t0 = time.time()
    r = f(*args)
    jax.block_until_ready(r)
    tc = time.time() - t0
    if absorb:
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
    t0 = time.time()
    r = f(*args)
    jax.block_until_ready(r)
    dt = time.time() - t0
    log(f"{name}: compile {tc:.1f}s, {1000*dt/STEPS:.3f} ms/step")

def scan_schedule(graph, batches, key):
    def body(c, b):
        pack = schedule(jax.random.fold_in(key, c), graph, b, degrees, True)
        return c + 1, pack.layers[0].slot_w.sum()
    return jax.lax.scan(body, 0, batches)[1].sum()

def scan_forward(params, hist, graph, feats, batches, key):
    def body(c, b):
        k1, k2 = jax.random.split(jax.random.fold_in(key, c))
        pack = schedule(k1, graph, b, degrees, True)
        logits, _ = M.forward(params, spec, pack, graph, hist, feats, k2,
                              cfg.keep_prob, True)
        return c + 1, logits.sum()
    return jax.lax.scan(body, 0, batches)[1].sum()

def scan_grad(params, hist, graph, feats, labels, batches, key):
    def body(c, b):
        k1, k2 = jax.random.split(jax.random.fold_in(key, c))
        pack = schedule(k1, graph, b, degrees, True)
        def loss_fn(p):
            logits, _ = M.forward(p, spec, pack, graph, hist, feats, k2,
                                  cfg.keep_prob, True)
            y = jnp.take(labels, pack.fields[-1], axis=0)
            valid = (pack.fields[-1] < n).astype(jnp.float32)
            l, _ = M.loss_and_metrics(p, spec, logits, y, valid,
                                      cfg.weight_decay)
            return l
        g = jax.grad(loss_fn)(params)
        return c + 1, sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
    return jax.lax.scan(body, 0, batches)[1].sum()

def scan_grad_constpack(params, hist, graph, feats, labels, batches, key):
    """Model-only cost: ONE schedule hoisted out of the scan, every step
    reuses the same pack — isolates the fwd+bwd critical path so
    (schedule-only) + (this) vs (full) reveals schedule/model overlap."""
    pack = schedule(jax.random.fold_in(key, 0), graph, batches[0], degrees,
                    True)

    def body(c, b):
        k2 = jax.random.fold_in(key, c)

        def loss_fn(p):
            logits, _ = M.forward(p, spec, pack, graph, hist, feats, k2,
                                  cfg.keep_prob, True)
            y = jnp.take(labels, pack.fields[-1], axis=0)
            valid = (pack.fields[-1] < n).astype(jnp.float32)
            l, _ = M.loss_and_metrics(p, spec, logits, y, valid,
                                      cfg.weight_decay)
            return l
        g = jax.grad(loss_fn)(params)
        return c + 1, sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
    return jax.lax.scan(body, 0, batches)[1].sum()


graph, feats, labels = tr.graph_train, tr.train_features, tr.labels
params, hist = tr.state.params, tr.state.histories
key = jax.random.PRNGKey(0)

timed("schedule", scan_schedule, graph, bm(), key, absorb=True)
timed("constpack+fwd+grad", scan_grad_constpack, params, hist, graph,
      feats, labels, bm(), key)
timed("sched+fwd", scan_forward, params, hist, graph, feats, bm(), key)
timed("sched+fwd+grad", scan_grad, params, hist, graph, feats, labels,
      bm(), key)

tr.state, m = tr._train_epoch(tr.state, graph, feats, labels,
                              tr.importance_train, bm(), key)
_ = float(m["loss"])
t0 = time.time()
tr.state, m = tr._train_epoch(tr.state, graph, feats, labels,
                              tr.importance_train, bm(), key)
_ = float(m["loss"])
log(f"full: {1000*(time.time()-t0)/STEPS:.3f} ms/step")
