"""L7 layer: experiment generator + log parsing (the reference's
scripts/run-experiments.py + plot-convergence/plot-var/analyze-time roles).

The strong check here is FORMAT INTEGRATION: the Trainer's real log
output must parse with scripts/parse_logs.py's reference-format regexes,
and every command the generator emits must be accepted by our flag
parser — the two halves of the reference workflow that meet only through
text."""

import os
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

import parse_logs  # noqa: E402
import run_experiments  # noqa: E402

from stochastic_gcn_tpu.config import parse_flags  # noqa: E402
from stochastic_gcn_tpu.data.loaders import synthetic_dataset  # noqa: E402
from stochastic_gcn_tpu.training.loop import Trainer  # noqa: E402


def test_generator_emits_reference_grid(tmp_path):
    """run_experiments writes the reference's 11-point grid x 6 datasets
    (run-experiments.py:7-88): run_<d>.sh per dataset plus test.sh/var.sh,
    with nell skipping the non-PP rows."""
    run_experiments.main(str(tmp_path))
    for d, n_runs in run_experiments.DATASETS_RUNS:
        lines = open(tmp_path / f"run_{d}.sh").read().splitlines()
        grid = [g for g in run_experiments.GRID
                if not (d == "nell" and not g[3])]
        assert len(lines) == len(grid) * n_runs
        assert all(f"configs/{d}.sh" in ln for ln in lines)
    assert (tmp_path / "test.sh").exists()
    assert (tmp_path / "var.sh").exists()


def test_generated_flags_parse(tmp_path):
    """Every flag combination the generator emits must be accepted by our
    parser (TF1-compatible bool spellings included)."""
    run_experiments.main(str(tmp_path))
    seen = set()
    for d, _ in run_experiments.DATASETS_RUNS:
        for ln in open(tmp_path / f"run_{d}.sh"):
            # tokens between the config script and the `| tee` tail
            body = ln.split(f"configs/{d}.sh", 1)[1].split("|")[0]
            seen.add(tuple(body.split()))     # flags AND their values
    assert len(seen) > 5
    for flags in seen:
        cfg = parse_flags(list(flags))
        assert cfg.early_stopping == 1000000
    # spot-check the spellings the reference grid relies on
    cfg = parse_flags(["--cv=False", "--preprocess=True", "--dropout", "0"])
    assert cfg.cv is False and cfg.preprocess is True and cfg.dropout == 0


def test_trainer_log_parses_with_reference_regexes(tmp_path):
    """Integration: real sgd_train output -> parse_logs epoch/test dicts
    (format contract of reference train.py:217-229 / 339-341)."""
    ds = synthetic_dataset(num_nodes=80, feature_dim=8, num_classes=3,
                           avg_degree=4, seed=0)
    cfg = parse_flags(["--dataset", "synthetic", "--batch_size", "40",
                       "--hidden1", "8", "--epochs", "3",
                       "--early_stopping", "100", "--cv", "--test_cv",
                       "--degree", "1", "--test_degree", "1"]) \
        .replace(ckpt_dir=str(tmp_path))
    tr = Trainer(cfg, ds)
    lines = []
    tr.sgd_train(log=lambda *a, **k: lines.append(" ".join(map(str, a))),
                 max_epochs=3)
    tr.run_tests(log=lambda *a, **k: lines.append(" ".join(map(str, a))))
    log_path = tmp_path / "train.log"
    log_path.write_text("\n".join(lines) + "\n")

    epochs = parse_logs.parse_epochs(str(log_path))
    assert len(epochs) == 3
    assert epochs[0]["epoch"] == 1
    assert epochs[-1]["data"] > 0
    assert all(np.isfinite(e["val_loss"]) for e in epochs)

    tests = parse_logs.parse_test(str(log_path))
    assert len(tests) >= 2            # num_layers+1 CV inference passes
    assert all(0.0 <= t["accuracy"] <= 1.0 for t in tests)

    tta = parse_logs.time_to_accuracy(epochs, threshold=0.0)
    assert tta is not None and tta["epochs"] == 1


def test_gradvar_log_parses(tmp_path):
    """The gradient-variance harness's output (reference train.py:241-277
    format) parses with parse_logs.parse_var."""
    ds = synthetic_dataset(num_nodes=60, feature_dim=8, num_classes=3,
                           avg_degree=4, seed=1)
    cfg = parse_flags(["--dataset", "synthetic", "--batch_size", "30",
                       "--hidden1", "8", "--degree", "1",
                       "--test_degree", "1", "--dropout", "0"]) \
        .replace(ckpt_dir=str(tmp_path))
    tr = Trainer(cfg, ds)
    lines = []
    tr.gradient_variance(times=4,
                         log=lambda *a, **k: lines.append(
                             " ".join(map(str, a))))
    log_path = tmp_path / "var.log"
    log_path.write_text("\n".join(lines) + "\n")
    var = parse_logs.parse_var(str(log_path))
    assert "full_pred_stdev" in var and "part_pred_bias" in var
    assert all(np.isfinite(v) for v in var.values())


def test_plot_convergence_renders(tmp_path):
    """plot_results renders a convergence figure from a real parsed log
    (reference scripts/plot-convergence.py role)."""
    matplotlib = pytest.importorskip("matplotlib")  # noqa: F841
    sys.path.insert(0, _ROOT)
    from scripts.plot_results import plot_ab, plot_convergence

    log = tmp_path / "cora_ppTrue_run0.log"
    log.write_text(
        "Epoch: 0001 train_loss= 1.00000 train_acc= 0.50000 "
        "val_loss= 0.90000 val_acc= 0.60000 mi F1=0.60000 ma F1=0.50000  "
        "time= 0.10000 ttime= 0.05000 data = 100\n"
        "Epoch: 0002 train_loss= 0.80000 train_acc= 0.70000 "
        "val_loss= 0.70000 val_acc= 0.78000 mi F1=0.78000 ma F1=0.70000  "
        "time= 0.10000 ttime= 0.05000 data = 200\n")
    out = tmp_path / "conv.png"
    plot_convergence([str(log)], "cora", "epoch", str(out))
    assert out.exists() and out.stat().st_size > 1000

    # the estimator A/B figure (ESTIMATOR_AB.json schema)
    import json
    abj = tmp_path / "ab.json"
    abj.write_text(json.dumps({
        "ab_exact_trajectory": [0.3, 0.9, 0.99],
        "ab_cvpp_trajectory": [0.2, 0.5, 0.9],
        "ab_target_micro_f1": 0.9}))
    out2 = tmp_path / "ab.png"
    plot_ab(str(abj), str(out2))
    assert out2.exists() and out2.stat().st_size > 1000
