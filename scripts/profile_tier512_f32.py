"""f32-history tier A/B at batch 512 (VERDICT r3 item 3).

TIER_MIN_ROWS=4096 was calibrated on bf16 histories, where tiering at
batch 512 is a latency-bound loss.  f32 pays 2x bytes per gathered row, so
the tier's break-even is lower there — this measures tier OFF vs FORCED ON
(SGT_TIER_MIN_ROWS=0) on the f32 path at batches 512 and 4096 to calibrate
a dtype-aware gate.

Run on the real chip from the repo root:
    python scripts/profile_tier512_f32.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SGT_TIER_MIN_ROWS"] = "0"     # gate decisions made here instead
import json
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
out = {}


def run(tag, batch, steps, **kw):
    def bm():
        ids = np.resize(rng.permutation(ds.train_d), steps * batch)
        return jnp.asarray(ids.astype(np.int32).reshape(steps, batch))

    cfg = Config(dataset="bench", batch_size=batch, degree=1, test_degree=1,
                 cv=True, test_cv=True, hidden1=bench.HIDDEN,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2, seed=1,
                 history_dtype="float32", **kw)
    tr = Trainer(cfg, ds)
    tr.state, m = tr._train_epoch(
        tr.state, tr.graph_train, tr.train_features, tr.labels,
        tr.importance_train, bm(), tr._next_key())
    _ = float(m["loss"])                       # sync: value fetch
    best, amt = [], 0
    for _ in range(3):
        t0 = time.time()
        tr.state, m = tr._train_epoch(
            tr.state, tr.graph_train, tr.train_features, tr.labels,
            tr.importance_train, bm(), tr._next_key())
        amt = int(m["amt_data"])               # sync: value fetch
        best.append((time.time() - t0) / steps * 1000)
    eps = amt / (min(best) * steps / 1000)
    log(f"{tag}: " + " ".join(f"{b:.3f}" for b in best)
        + f" ms/step (min {min(best):.3f}) edges/s={eps:.0f}")
    out[f"{tag}_ms"] = round(min(best), 4)
    out[f"{tag}_edges_per_s"] = round(eps, 0)
    del tr, m
    return min(best)


for batch, steps in ((512, 300), (4096, 100)):
    off = run(f"f32_b{batch}_tier_off", batch, steps, fadj_tier=False)
    on = run(f"f32_b{batch}_tier_on", batch, steps, fadj_tier=True)
    out[f"f32_b{batch}_tier_speedup"] = round(off / on, 3)
    log(f"==> f32 batch {batch}: {off:.3f} -> {on:.3f} ms/step "
        f"({off / on:.2f}x)")
print(json.dumps(out))
