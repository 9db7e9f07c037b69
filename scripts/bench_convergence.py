"""Reddit-scale convergence benchmark: epochs-to-target micro-F1 for CV+PP
degree=1 — the second north-star metric (BASELINE.md).

Standalone wrapper around bench.run_convergence_planted (the SBM-band
gate bench.run_convergence is what the driver bench reports now).  The
original Reddit dataset is not
available, so the task plants a learnable signal on the bench graph
(labels from 1-hop-smoothed features); on real Reddit use
--target_f1 0.94 (the reference analyze-time.py threshold).
Emits one JSON line.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    # measured: this synthetic 41-class task reaches ~0.35 around epoch 60
    ap.add_argument("--target_f1", type=float, default=0.35)
    ap.add_argument("--max_epochs", type=int, default=60)
    args = ap.parse_args()

    from bench import build_reddit_like, run_convergence_planted, BATCH, HIDDEN, \
        PAD_DEG
    from stochastic_gcn_tpu.config import Config

    base = build_reddit_like()
    cfg = Config(dataset="reddit_like", batch_size=BATCH, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=HIDDEN,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2,
                 pad_degree=PAD_DEG, seed=1)
    out = run_convergence_planted(cfg, base, target_f1=args.target_f1,
                          max_epochs=args.max_epochs)
    out["metric"] = "reddit_like_cvpp_deg1_epochs_to_f1"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
