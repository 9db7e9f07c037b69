"""Reddit-scale convergence benchmark: epochs-to-target micro-F1 for CV+PP
degree=1 — the second north-star metric (BASELINE.md).

The original Reddit dataset is not available, so this plants a learnable
signal on the bench graph (labels from 2-hop-smoothed features, like the
test-suite's synthetic generator) and measures epochs + wall time to reach
the target validation micro-F1 with the reference's Reddit recipe.
Emits one JSON line.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    # measured: this synthetic 41-class task reaches ~0.35 around epoch
    # 60 and ~0.385 by epoch 100 (still climbing); on real Reddit use
    # --target_f1 0.94 (the reference analyze-time threshold)
    ap.add_argument("--target_f1", type=float, default=0.35)
    ap.add_argument("--max_epochs", type=int, default=30)
    ap.add_argument("--cache", default="data/bench_reddit_planted.npz")
    args = ap.parse_args()

    from bench import build_reddit_like, BATCH, HIDDEN, PAD_DEG
    from stochastic_gcn_tpu.config import Config
    from stochastic_gcn_tpu.data.graph import Dataset
    from stochastic_gcn_tpu.training.loop import Trainer

    t0 = time.time()
    base = build_reddit_like()
    # plant a learnable signal: labels from a 2-hop smoothed projection
    if os.path.exists(args.cache):
        z = np.load(args.cache)
        labels = z["labels"]
    else:
        rng = np.random.default_rng(1)
        n_cls = base.labels.shape[1]
        proj = rng.normal(size=(base.feats.shape[1], n_cls)).astype(
            np.float32)
        # 1-hop smoothed signal: exactly the quantity PP precomputes, so a
        # well-trained model can recover it — the benchmark then measures
        # optimization speed, not task impossibility
        smooth = base.full_adj.dot(base.feats)
        logits = smooth @ proj
        labels = np.zeros_like(base.labels)
        labels[np.arange(base.num_data), logits.argmax(1)] = 1
        os.makedirs(os.path.dirname(args.cache) or ".", exist_ok=True)
        np.savez(args.cache, labels=labels)
    ds = Dataset(num_data=base.num_data, train_adj=base.train_adj,
                 full_adj=base.full_adj, feats=base.feats,
                 train_feats=base.train_feats, test_feats=base.test_feats,
                 labels=labels, train_d=base.train_d, val_d=base.val_d,
                 test_d=base.test_d)
    print(f"data ready in {time.time()-t0:.1f}s", file=sys.stderr)

    cfg = Config(dataset="reddit_like", batch_size=BATCH, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=HIDDEN,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2,
                 pad_degree=PAD_DEG, seed=1, test_batch_size=2048)
    tr = Trainer(cfg, ds)
    print("trainer ready", file=sys.stderr)

    t_start = time.time()
    hit = None
    best = 0.0
    for epoch in range(args.max_epochs):
        loss, acc, ttime, _ = tr.train_epoch()
        vloss, vacc, micro, macro, _ = tr.evaluate(ds.val_d)
        best = max(best, micro)
        print(f"epoch {epoch+1}: train_loss {loss:.4f} val_acc {vacc:.4f} "
              f"micro_f1 {micro:.4f}", file=sys.stderr, flush=True)
        if micro >= args.target_f1 and hit is None:
            hit = dict(epochs=epoch + 1,
                       seconds=round(time.time() - t_start, 1))
            break

    print(json.dumps({
        "metric": "reddit_like_cvpp_deg1_epochs_to_f1",
        "target_micro_f1": args.target_f1,
        "reached": hit,
        "best_micro_f1": round(best, 4),
        "epochs_run": epoch + 1,
        "total_seconds": round(time.time() - t_start, 1),
    }))


if __name__ == "__main__":
    main()
