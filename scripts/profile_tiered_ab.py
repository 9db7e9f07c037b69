"""A/B: two-tier CV full-neighborhood term (--fadj_tier) on the headline
bench config (CV+PP deg=1, bf16 history, hidden 128).

The bench train graph is padded to max degree 64; its all-node mean
degree is ~28, but the full-term field rows are TRAIN nodes, whose mean
train-degree is ~42 (non-train rows are zero-degree in train_adj) — so
~1/3 of the full-term history-row gather — 90% of the step's row issues
(PERF.md roofline) — is zero-weight padding, concentrated Poisson-like
around 42 (which is why choose_tier lands at tier_w=56, not lower).  The tiered
contraction gathers [F, tier_w] for every row plus a capacity-bounded
full-width tail for the few big rows.  Same-process A/B (cross-run tunnel
variance >10%), 3 reps.
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


def bm(steps, batch):
    ids = np.resize(rng.permutation(ds.train_d), steps * batch)
    return jnp.asarray(ids.astype(np.int32).reshape(steps, batch))


def run(tag, batch, steps, reps=3, **kw):
    cfg = Config(dataset="bench", batch_size=batch, degree=1, test_degree=1,
                 cv=True, test_cv=True, hidden1=bench.HIDDEN,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2, seed=1,
                 **kw)
    tr = Trainer(cfg, ds)
    if kw.get("fadj_tier"):
        log(f"{tag}: tier_w={tr.graph_train.tier_w} "
            f"tier_frac={tr.graph_train.tier_frac:.4f}")
    # warmup (compile + one-time fetch stall)
    tr.state, m = tr._train_epoch(
        tr.state, tr.graph_train, tr.train_features, tr.labels,
        tr.importance_train, bm(steps, batch), tr._next_key())
    _ = float(m["loss"])
    best = []
    for _ in range(reps):
        t0 = time.time()
        tr.state, m = tr._train_epoch(
            tr.state, tr.graph_train, tr.train_features, tr.labels,
            tr.importance_train, bm(steps, batch), tr._next_key())
        _ = float(m["loss"])
        best.append((time.time() - t0) / steps * 1000)
    log(f"{tag}: batch={batch} " +
        " ".join(f"{b:.3f}" for b in best) +
        f" ms/step (min {min(best):.3f}) loss={float(m['loss']):.3f}")
    del tr
    return min(best)


for batch, steps in ((512, 300), (4096, 100)):
    off = run("tier OFF", batch, steps, fadj_tier=False)
    on = run("tier ON ", batch, steps, fadj_tier=True)
    log(f"==> batch {batch}: {off:.3f} -> {on:.3f} ms/step "
        f"({off / on:.2f}x)")

# f32-history arms: scripts/profile_tiered_f32.py.
# Measured 2026-08-19 (pre-gate, tier forced at every field size):
#   batch 512:  0.450 -> 0.846 ms/step (0.53x)  — latency-bound LOSS
#   batch 4096: 3.303 -> 2.785 ms/step (1.19x)  — gather-work-bound WIN
# -> production gates the tier at aggregators.TIER_MIN_ROWS (4096) field
#    rows; at smaller fields ON now traces the identical plain path.
