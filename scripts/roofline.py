"""Roofline accounting for the headline bench step (VERDICT r1 item 6).

Computes, for the bench config (CV+PP deg=1, batch 512/4096, hidden 128,
Dcap 64, bf16 history), the per-step:
  * dense FLOPs (fwd+bwd, from XLA cost_analysis of the compiled step)
  * gather row issues (full-neighborhood + delta + feature + fanout rows)
  * bytes moved by those gathers
and relates them to the measured step time and the chip's three ceilings:
  * MXU peak (TPU v5e: ~197 TFLOP/s bf16, ~49 TFLOP/s f32)
  * HBM bandwidth (~819 GB/s)
  * gather issue rate (measured on THIS chip: ~220M rows/s bf16,
    ~130M rows/s f32 — PERF.md finding #5)

The point of the exercise: the step is GATHER-ISSUE bound, not FLOP or
bandwidth bound — MFU is structurally low for sparse aggregation, and the
correct utilization number is rows-issued / issue-bound.

Usage:  python scripts/roofline.py [--batch 512] [--step_ms 0.554]
        (run on CPU or TPU; cost_analysis uses the local backend's HLO)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

V5E_BF16_TFLOPS = 197e12
V5E_F32_TFLOPS = 49e12
V5E_HBM_GBS = 819e9
ISSUE_BOUND_BF16 = 220e6   # rows/s, measured (PERF.md #5, scripts/profile_cv_terms.py)
ISSUE_BOUND_F32 = 130e6


def build(batch: int, hidden: int = 128, pad_deg: int = 64):
    """The bench trainer itself (same dataset cache, same config) so the
    accounted shapes are exactly the benchmarked ones."""
    import bench
    from stochastic_gcn_tpu.config import Config
    from stochastic_gcn_tpu.training.loop import Trainer

    ds = bench.build_reddit_like()
    cfg = Config(dataset="reddit_like", batch_size=batch, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=hidden,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2,
                 pad_degree=pad_deg, seed=1)
    return Trainer(cfg, ds), cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--step_ms", type=float, default=None,
                    help="measured steady-state ms/step on the real chip")
    ap.add_argument("--hist_bytes", type=int, default=2,
                    help="history dtype bytes (2 = bf16 default)")
    args = ap.parse_args()

    tr, cfg = build(args.batch)
    from stochastic_gcn_tpu.training.step import build_train_step
    step = build_train_step(cfg, tr.train_spec, tr.train_degrees,
                            tr.ds.num_data)
    batch_ids = jnp.asarray(np.asarray(tr.ds.train_d[:args.batch], np.int32))
    lowered = jax.jit(step).lower(tr.state, tr.graph_train,
                                  tr.train_features, tr.labels,
                                  tr.importance_train, batch_ids,
                                  jax.random.PRNGKey(0))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))

    # --- gather row-issue accounting (the real roofline) ----------------
    B = args.batch
    dcap = int(tr.graph_train.nbr.shape[1])
    d = cfg.hidden1
    feat_dim = int(tr.train_features.shape[1]) if hasattr(
        tr.train_features, "shape") else tr.train_features.dim
    # per step: PP model has ONE aggregation layer; fields F1=B, F0=2B
    f_out, f_in = B, 2 * B
    rows = {
        # CV full-neighborhood term: [F_out, Dcap] history rows
        "full-term history rows": f_out * dcap,
        # delta term: history rows on the input field
        "delta history rows": f_in,
        # input feature rows (dense, dim 2*602 after PP concat)
        "feature rows": f_in,
        # graph neighbor/weight rows for sampling + full term
        "graph rows (nbr+w)": 2 * f_out,
        # fanout gather of activations (deg=1) fwd
        "fanout activation rows": f_out,
    }
    bytes_moved = (
        rows["full-term history rows"] * d * args.hist_bytes
        + rows["delta history rows"] * d * args.hist_bytes
        + rows["feature rows"] * feat_dim * 4
        + rows["graph rows (nbr+w)"] * dcap * 8
        + rows["fanout activation rows"] * d * 4)
    issue_rows = sum(rows.values())

    print(f"batch {B}, Dcap {dcap}, hidden {d}, feat {feat_dim}")
    print(f"XLA cost_analysis flops/step: {flops/1e9:.2f} GFLOP")
    for k, v in rows.items():
        print(f"  {k:28s} {v:>8d}")
    print(f"gather rows issued/step: {issue_rows} "
          f"(bytes ~ {bytes_moved/1e6:.1f} MB)")

    t_issue_bf16 = rows["full-term history rows"] / ISSUE_BOUND_BF16 + (
        issue_rows - rows["full-term history rows"]) / ISSUE_BOUND_F32
    print(f"\nfloor times at each ceiling:")
    print(f"  MXU bf16 {flops/V5E_BF16_TFLOPS*1e3:.3f} ms | "
          f"MXU f32 {flops/V5E_F32_TFLOPS*1e3:.3f} ms")
    print(f"  HBM      {bytes_moved/V5E_HBM_GBS*1e3:.3f} ms (gathered bytes"
          " only)")
    print(f"  gather issue rate {t_issue_bf16*1e3:.3f} ms")
    if args.step_ms:
        t = args.step_ms / 1e3
        print(f"\nmeasured {args.step_ms} ms/step:")
        print(f"  MFU (vs bf16 peak)          {flops/t/V5E_BF16_TFLOPS:6.2%}")
        print(f"  MFU (vs f32 peak)           {flops/t/V5E_F32_TFLOPS:6.2%}")
        print(f"  HBM util (gathered bytes)   {bytes_moved/t/V5E_HBM_GBS:6.2%}")
        print(f"  gather-issue-bound share    {t_issue_bf16/t:6.2%}")


if __name__ == "__main__":
    main()
