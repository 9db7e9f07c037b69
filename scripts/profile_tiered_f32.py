"""Tier A/B on the f32-history path only (batch 4096).

The f32 full-term gather pays 2x the bytes of the bf16 default, so the
two-tier term's saved rows are worth double there — this targets the
VERDICT r2 "f32-history throughput near the reference bound" weak spot.
Run after scripts/profile_tiered_ab.py (shares the cached bench graph).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax.numpy as jnp

import bench
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ds = bench.build_reddit_like()
rng = np.random.default_rng(7)
BATCH, STEPS = 4096, 100


def bm():
    ids = np.resize(rng.permutation(ds.train_d), STEPS * BATCH)
    return jnp.asarray(ids.astype(np.int32).reshape(STEPS, BATCH))


def run(tag, **kw):
    cfg = Config(dataset="bench", batch_size=BATCH, degree=1, test_degree=1,
                 cv=True, test_cv=True, hidden1=bench.HIDDEN,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2, seed=1,
                 history_dtype="float32", **kw)
    tr = Trainer(cfg, ds)
    tr.state, m = tr._train_epoch(
        tr.state, tr.graph_train, tr.train_features, tr.labels,
        tr.importance_train, bm(), tr._next_key())
    _ = float(m["loss"])
    best, amt = [], 0
    for _ in range(3):
        t0 = time.time()
        tr.state, m = tr._train_epoch(
            tr.state, tr.graph_train, tr.train_features, tr.labels,
            tr.importance_train, bm(), tr._next_key())
        amt = int(m["amt_data"])
        best.append((time.time() - t0) / STEPS * 1000)
    log(f"{tag}: " + " ".join(f"{b:.3f}" for b in best)
        + f" ms/step (min {min(best):.3f}) edges/s="
        f"{amt / (min(best) * STEPS / 1000):.0f}")
    del tr
    return min(best)


off = run("f32 tier OFF", fadj_tier=False)
on = run("f32 tier ON ", fadj_tier=True)
log(f"==> f32 batch {BATCH}: {off:.3f} -> {on:.3f} ms/step "
    f"({off / on:.2f}x)")
