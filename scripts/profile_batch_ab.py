"""Batch-size time-to-accuracy A/B: is the batch-4096 throughput a usable
training recipe, or does it trade convergence for edges/s?

CVD+PP (the paper's headline estimator) on the community benchmark graph
(bench.build_community_reddit) at batch 512 vs 4096: epochs and TRAIN
seconds to the 0.90 micro-F1 band + plateau.  Fewer steps/epoch at 4096
means fewer history refreshes per epoch — the CV staleness grows — so
parity here is a real empirical claim, not arithmetic.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np

import bench
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ds = bench.build_community_reddit()
TARGET = bench.AB_TARGET_F1
EPOCHS = 40

for batch in (512, 4096):
    cfg = Config(dataset="sbm_reddit", batch_size=batch, degree=1,
                 cv=True, cvd=True, test_cv=True, test_cvd=True,
                 test_degree=10000, hidden1=bench.HIDDEN,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2,
                 test_batch_size=2048, pad_degree=64, seed=1)
    tr = Trainer(cfg, ds)
    tr.train_epoch()
    tr.evaluate(ds.val_d)          # compile + one-time fetch
    del tr
    tr = Trainer(cfg, ds)
    train_s, hit = 0.0, None
    traj = []
    for ep in range(EPOCHS):
        t0 = time.time()
        tr.train_epoch()
        train_s += time.time() - t0
        _, _, micro, _, _ = tr.evaluate(ds.val_d)
        traj.append(float(micro))
        if hit is None and micro >= TARGET:
            hit = (ep + 1, round(train_s, 2), tr.amt_data)
        log(f"batch {batch} epoch {ep + 1}: micro_f1 {micro:.4f} "
            f"(train {train_s:.1f}s)")
    log(f"==> batch {batch}: to-{TARGET}: {hit}; plateau "
        f"{np.mean(traj[-5:]):.4f}; best {max(traj):.4f}; "
        f"epoch train {train_s / EPOCHS:.3f}s")
    del tr
