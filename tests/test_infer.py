"""Inference surface: Trainer.predict + the cli/infer.py serving driver.

The reference reaches predictions only through train.py's Test() path;
this framework adds a standalone batched-prediction surface.  Oracles:

1. predict() is order-correct and returns proper probability rows.
2. With a CV eval model, predict(refresh=True) equals exact inference
   (the L+1-pass Test protocol, reference train.py:339-341) — so it is
   deterministic and invariant to test_batch_size.
3. The infer CLI round-trips a checkpoint: its npz matches an in-process
   predict() on the training Trainer.
4. The dp=8 sharded predict path matches single-chip predictions.
"""

import os

import numpy as np
import pytest

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data.loaders import load_data, synthetic_dataset
from stochastic_gcn_tpu.training.loop import Trainer

KW = dict(batch_size=32, test_batch_size=16, hidden1=16, dropout=0.0,
          seed=3, degree=1, test_degree=1, cv=True, test_cv=True,
          learning_rate=0.01)


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(num_nodes=80, feature_dim=16, num_classes=4,
                             avg_degree=5, seed=0)


def _trained(cfg, ds, epochs=3):
    tr = Trainer(cfg, ds)
    for _ in range(epochs):
        tr.train_epoch()
    return tr


def test_predict_rows_and_order(ds):
    tr = _trained(Config(dataset="synthetic", **KW), ds)
    ids = np.asarray(ds.test_d[:19])
    probs = tr.predict(ids)
    assert probs.shape == (19, ds.num_classes)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    # order-correctness: converged CV inference is exact inference, so a
    # reversed id list must return exactly reversed rows
    rev = tr.predict(ids[::-1])
    np.testing.assert_allclose(rev, probs[::-1], rtol=1e-5, atol=1e-6)


def test_predict_cv_equals_exact_inference(ds):
    """After refresh passes, sampled-CV predictions equal an exact-mode
    (degree > max deg, no CV) forward with the same weights."""
    max_deg = int(np.diff(ds.full_adj.indptr).max())
    tr = _trained(Config(dataset="synthetic", **KW), ds)
    exact_cfg = Config(dataset="synthetic", **{**KW, "cv": False,
                       "test_cv": False, "degree": max_deg + 1,
                       "test_degree": max_deg + 1})
    import dataclasses
    tr_exact = Trainer(exact_cfg, ds)
    tr_exact.state = dataclasses.replace(tr_exact.state,
                                         params=tr.state.params)
    ids = np.asarray(ds.test_d)
    import jax
    with jax.default_matmul_precision("float32"):
        p_cv = tr.predict(ids)
        p_exact = tr_exact.predict(ids, refresh=False)
    np.testing.assert_allclose(p_cv, p_exact, rtol=5e-4, atol=5e-5)


def test_predict_invariant_to_test_batch_size(ds):
    out = []
    for tbs in (7, 16):
        cfg = Config(dataset="synthetic", **{**KW, "test_batch_size": tbs})
        tr = _trained(cfg, ds, epochs=2)
        out.append(tr.predict(np.asarray(ds.val_d[:19])))
    np.testing.assert_allclose(out[0], out[1], rtol=5e-4, atol=5e-5)


def test_predict_refresh_is_incremental(ds):
    """Repeated predict() calls pay the num_layers full refresh passes once
    per weight change: the second call must skip the refresh (histories
    converged under unchanged weights stay converged), a train_epoch or
    load must re-arm it, and refresh="force" overrides the skip."""
    tr = _trained(Config(dataset="synthetic", **KW), ds)
    ids = np.asarray(ds.test_d[:10])
    calls = []
    orig_evaluate = tr.evaluate
    tr.evaluate = lambda d: calls.append(len(d)) or orig_evaluate(d)

    p1 = tr.predict(ids)
    n_refresh = len(calls)
    assert n_refresh == tr.cfg.num_layers     # full refresh on first call
    p2 = tr.predict(ids)
    assert len(calls) == n_refresh            # second call: no refresh
    np.testing.assert_allclose(p2, p1, rtol=1e-6, atol=1e-7)

    tr.predict(ids, refresh="force")
    assert len(calls) == 2 * n_refresh        # explicit override refreshes

    tr.train_epoch()                          # weights changed
    tr.predict(ids)
    assert len(calls) == 3 * n_refresh        # stale -> refresh again


def test_infer_cli_roundtrip(tmp_path):
    from stochastic_gcn_tpu.cli import infer
    name = "synthetic:120:16:4"
    flags = ["--dataset", name, "--batch_size", "32", "--hidden1", "16",
             "--dropout", "0", "--seed", "3", "--degree", "1",
             "--test_degree", "1", "--cv", "--test_cv",
             "--ckpt_dir", str(tmp_path)]
    cfg = Config(dataset=name, ckpt_dir=str(tmp_path), **KW)
    ds = load_data(cfg)
    tr = _trained(cfg, ds, epochs=2)
    tr.save()
    want = tr.predict(np.asarray(ds.test_d))

    out = str(tmp_path / "preds.npz")
    infer.main(["--nodes", "test", "--out", out] + flags)
    z = np.load(out)
    assert z["probs"].shape == (len(ds.test_d), ds.num_classes)
    assert z["pred"].shape == (len(ds.test_d),)
    np.testing.assert_array_equal(z["ids"], ds.test_d)
    np.testing.assert_allclose(z["probs"], want, rtol=5e-4, atol=5e-5)
    # explicit id-list selection
    some = ",".join(str(i) for i in ds.test_d[:5])
    probs = infer.main(["--nodes", some] + flags)
    np.testing.assert_allclose(probs, want[:5], rtol=5e-4, atol=5e-5)


def test_predict_dp8_matches_single_chip(tmp_path, ds):
    cfg = Config(dataset="synthetic", ckpt_dir=str(tmp_path), **KW)
    tr = _trained(cfg, ds, epochs=2)
    tr.save()
    want = tr.predict(np.asarray(ds.val_d))

    dp_cfg = cfg.replace(dp=8, owner_batching=True,
                         partition_nodes="rcm")
    tr_dp = Trainer(dp_cfg, ds)
    tr_dp.load(load_history=True)
    got = tr_dp.predict(np.asarray(ds.val_d))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
