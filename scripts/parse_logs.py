"""Log parsing + analysis — the reference's plot/analysis script roles.

The epoch log line format matches the reference (train.py:217-229), so this
module provides the token-position parser used by all four reference
analysis scripts (plot-convergence.py:78-91, plot-var.py:24-48,
plot-test.py:22-34, analyze-time.py:12-71) plus time-to-accuracy extraction.
Plotting (matplotlib) is optional; the parsed data is importable.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

# per-dataset acceptance bands (plot-convergence.py:17-22)
ACCURACY_BANDS = {
    "citeseer": (0.69, 0.72),
    "cora": (0.77, 0.80),
    "pubmed": (0.77, 0.81),
    "nell": (0.60, 0.68),
    "reddit": (0.95, 0.968),
    "ppi": (0.90, 0.97),
}

EPOCH_RE = re.compile(
    r"Epoch:\s*(\d+)\s*"
    r"train_loss=\s*([\d.naif]+)\s*train_acc=\s*([\d.naif]+)\s*"
    r"val_loss=\s*([\d.naif]+)\s*val_acc=\s*([\d.naif]+)\s*"
    r"mi F1=([\d.naif]+)\s*ma F1=([\d.naif]+)\s*"
    r"time=\s*([\d.]+)\s*ttime=\s*([\d.]+).*?data\s*=\s*(\d+)")

TEST_RE = re.compile(
    r"Test set results:\s*cost=\s*([\d.naif]+)\s*accuracy=\s*([\d.naif]+)\s*"
    r"mi F1=([\d.naif]+)\s*ma F1=([\d.naif]+)")

VAR_RE = re.compile(r"(Full|Part) (pred|grad) (bias|stdev) = ([\d.e+-]+)")


def parse_epochs(path: str) -> list[dict]:
    out = []
    for line in open(path):
        m = EPOCH_RE.search(line)
        if m:
            out.append(dict(
                epoch=int(m.group(1)), train_loss=float(m.group(2)),
                train_acc=float(m.group(3)), val_loss=float(m.group(4)),
                val_acc=float(m.group(5)), micro_f1=float(m.group(6)),
                macro_f1=float(m.group(7)), time=float(m.group(8)),
                eval_time=float(m.group(9)), data=int(m.group(10))))
    return out


def parse_test(path: str) -> list[dict]:
    out = []
    for line in open(path):
        m = TEST_RE.search(line)
        if m:
            out.append(dict(cost=float(m.group(1)), accuracy=float(m.group(2)),
                            micro_f1=float(m.group(3)),
                            macro_f1=float(m.group(4))))
    return out


def parse_var(path: str) -> dict:
    out = {}
    for line in open(path):
        m = VAR_RE.search(line)
        if m:
            out[f"{m.group(1).lower()}_{m.group(2)}_{m.group(3)}"] = \
                float(m.group(4))
    return out


def time_to_accuracy(epochs: list[dict], threshold: float):
    """Cumulative wall time/data until val accuracy crosses threshold
    (analyze-time.py:12-71 role; Reddit threshold = 0.94)."""
    t = 0.0
    for e in epochs:
        t += e["time"]
        if e["val_acc"] >= threshold:
            return dict(epochs=e["epoch"], seconds=t, data=e["data"])
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--mode", choices=["epochs", "test", "var"],
                    default="epochs")
    args = ap.parse_args()
    for path in args.logs:
        name = os.path.basename(path)
        if args.mode == "test":
            print(name, parse_test(path))
        elif args.mode == "var":
            print(name, parse_var(path))
        else:
            ep = parse_epochs(path)
            if not ep:
                print(name, "no epochs parsed")
                continue
            best = max(e["val_acc"] for e in ep)
            line = f"{name}: {len(ep)} epochs, best val_acc {best:.4f}"
            if args.threshold:
                tta = time_to_accuracy(ep, args.threshold)
                line += f", time-to-{args.threshold}: {tta}"
            print(line)


if __name__ == "__main__":
    main()
