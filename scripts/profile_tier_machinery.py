"""Tier position-machinery A/B (round 4): lax.top_k flag compaction vs
the round-3 cumsum+scatter chain, measured END-TO-END on the tiered step
(SGT_TIER_MIN_ROWS=0 forces the tiered path at batch 512 too).

The tier loses at batch 512 on bf16 because its compaction/cond machinery
costs ~0.4 ms of serial kernel latency (PERF.md round 3); if top_k cuts
that, the tier's gate can open at smaller fields — most valuable on the
f32-history path where each saved gather row pays double.

Run on the real chip from the repo root:
    python scripts/profile_tier_machinery.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SGT_TIER_MIN_ROWS"] = "0"
import json
import time

import numpy as np
import jax.numpy as jnp

import bench
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.models import aggregators as A
from stochastic_gcn_tpu.training.loop import Trainer


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ds = bench.build_reddit_like()
rng = np.random.default_rng(7)
out = {}


def run(tag, batch, steps, hdtype, impl):
    A.TIER_POS_IMPL = impl

    def bm():
        ids = np.resize(rng.permutation(ds.train_d), steps * batch)
        return jnp.asarray(ids.astype(np.int32).reshape(steps, batch))

    cfg = Config(dataset="bench", batch_size=batch, degree=1, test_degree=1,
                 cv=True, test_cv=True, hidden1=bench.HIDDEN,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2, seed=1,
                 history_dtype=hdtype, fadj_tier=True)
    tr = Trainer(cfg, ds)
    tr.state, m = tr._train_epoch(
        tr.state, tr.graph_train, tr.train_features, tr.labels,
        tr.importance_train, bm(), tr._next_key())
    _ = float(m["loss"])                       # sync: value fetch
    best = []
    for _ in range(3):
        t0 = time.time()
        tr.state, m = tr._train_epoch(
            tr.state, tr.graph_train, tr.train_features, tr.labels,
            tr.importance_train, bm(), tr._next_key())
        _ = int(m["amt_data"])                 # sync: value fetch
        best.append((time.time() - t0) / steps * 1000)
    log(f"{tag}: " + " ".join(f"{b:.3f}" for b in best)
        + f" ms/step (min {min(best):.3f})")
    out[f"{tag}_ms"] = round(min(best), 4)
    del tr, m
    return min(best)


for hdtype in ("bfloat16", "float32"):
    for batch, steps in ((512, 300), (4096, 100)):
        key = f"{hdtype}_b{batch}"
        cs = run(f"{key}_cumsum", batch, steps, hdtype, "cumsum")
        tk = run(f"{key}_topk", batch, steps, hdtype, "topk")
        out[f"{key}_topk_speedup"] = round(cs / tk, 3)
        log(f"==> {key}: cumsum {cs:.3f} -> topk {tk:.3f} ms/step "
            f"({cs / tk:.2f}x)")
print(json.dumps(out))
