"""Plot rendering — the reference's scripts/plot-*.py roles.

Consumes logs parsed by scripts/parse_logs.py and renders:
  * convergence curves (val accuracy vs epoch / time / data) with the
    per-dataset acceptance bands  (plot-convergence.py role)
  * gradient bias/stdev bar charts from --gradvar logs  (plot-var.py role)
  * final test-accuracy bars  (plot-test.py role)

Usage:
  python scripts/plot_results.py convergence logs/*.log --dataset cora
  python scripts/plot_results.py var logs/Var*.log
  python scripts/plot_results.py test logs/test_*.log
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from scripts.parse_logs import (ACCURACY_BANDS, parse_epochs, parse_test,
                                parse_var)  # noqa: E402


def plot_convergence(logs, dataset, x_axis, out):
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for path in logs:
        ep = parse_epochs(path)
        if not ep:
            continue
        if x_axis == "epoch":
            xs = [e["epoch"] for e in ep]
        elif x_axis == "time":
            t = 0.0
            xs = []
            for e in ep:
                t += e["time"]
                xs.append(t)
        else:  # data
            xs = [e["data"] for e in ep]
        ax.plot(xs, [e["val_acc"] for e in ep],
                label=os.path.basename(path).replace(".log", ""), lw=1.2)
    if dataset in ACCURACY_BANDS:
        lo, hi = ACCURACY_BANDS[dataset]
        ax.axhspan(lo, hi, color="green", alpha=0.1,
                   label=f"acceptance band [{lo}, {hi}]")
    ax.set_xlabel(x_axis)
    ax.set_ylabel("validation accuracy")
    ax.set_title(f"{dataset or 'convergence'}")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


def plot_var(logs, out):
    names, pbias, pstd, gbias, gstd = [], [], [], [], []
    for path in logs:
        v = parse_var(path)
        if not v:
            continue
        names.append(os.path.basename(path).replace(".log", ""))
        pbias.append(v.get("part_pred_bias", 0))
        pstd.append(v.get("part_pred_stdev", 0))
        gbias.append(v.get("part_grad_bias", 0))
        gstd.append(v.get("part_grad_stdev", 0))
    if not names:
        print("no var logs parsed")
        return
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    x = range(len(names))
    for ax, (bias, std, title) in zip(
            axes, [(pbias, pstd, "prediction"), (gbias, gstd, "gradient")]):
        ax.bar([i - 0.2 for i in x], bias, width=0.4, label="bias")
        ax.bar([i + 0.2 for i in x], std, width=0.4, label="stdev")
        ax.set_xticks(list(x))
        ax.set_xticklabels(names, rotation=30, ha="right", fontsize=7)
        ax.set_title(f"{title} bias/stdev (relative)")
        ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


def plot_test(logs, out):
    names, accs = [], []
    for path in logs:
        t = parse_test(path)
        if not t:
            continue
        names.append(os.path.basename(path).replace(".log", ""))
        accs.append(t[-1]["accuracy"])
    if not names:
        print("no test logs parsed")
        return
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.bar(range(len(names)), accs)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=30, ha="right", fontsize=7)
    ax.set_ylabel("test accuracy")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


def plot_ab(ab_json, out):
    """Estimator time-to-accuracy curves from an ESTIMATOR_AB.json /
    BENCH_r*.json record (bench.py::run_estimator_ab ``ab_*_trajectory``
    keys) — the role of the reference's plot-convergence.py figure."""
    import json
    with open(ab_json) as f:
        d = json.load(f)
    target = d.get("ab_target_micro_f1")
    fig, ax = plt.subplots(figsize=(7, 4))
    for key in sorted(d):
        if not key.endswith("_trajectory"):
            continue
        name = key[len("ab_"):-len("_trajectory")]
        traj = d[key]
        ax.plot(range(1, len(traj) + 1), traj, label=name.upper(),
                marker=".", markersize=3)
    if target:
        ax.axhline(target, color="gray", ls="--", lw=0.8,
                   label=f"band {target}")
    ax.set_xlabel("epoch")
    ax.set_ylabel("val micro-F1 (exact inference)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["convergence", "var", "test", "ab"])
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--x", choices=["epoch", "time", "data"],
                    default="epoch")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"{args.mode}.png"
    if args.mode == "convergence":
        plot_convergence(args.logs, args.dataset, args.x, out)
    elif args.mode == "var":
        plot_var(args.logs, out)
    elif args.mode == "ab":
        plot_ab(args.logs[0], out)
    else:
        plot_test(args.logs, out)


if __name__ == "__main__":
    main()
