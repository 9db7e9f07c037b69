"""Polyak/EMA parameter averaging (--polyak_decay).

The reference carries a dormant half-implementation (average_model/
backup_model/restore_model, gcn/models.py:104-121, never wired into
train.py); here it is a working feature: the train step maintains an
on-device EMA of the post-update weights, and evaluation/test use the
averaged weights.
"""

import numpy as np
import pytest

import jax

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data.loaders import synthetic_dataset
from stochastic_gcn_tpu.training.loop import Trainer


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(num_nodes=150, feature_dim=16, num_classes=4,
                             avg_degree=5, seed=0)


def test_polyak_ema_semantics(ds):
    """One epoch of exactly one step: avg' = d*avg0 + (1-d)*params'."""
    d = 0.9
    cfg = Config(dataset="synthetic", batch_size=len(ds.train_d), degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=16,
                 dropout=0.0, seed=1, polyak_decay=d)
    tr = Trainer(cfg, ds)
    p0 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    a0 = jax.tree_util.tree_map(np.asarray, tr.state.avg_params)
    # EMA starts at the initial weights
    for x, y in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(a0)):
        np.testing.assert_array_equal(x, y)
    tr.train_epoch()
    p1 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    a1 = jax.tree_util.tree_map(np.asarray, tr.state.avg_params)
    want = jax.tree_util.tree_map(lambda a, p: a * d + p * (1 - d), a0, p1)
    for w, got in zip(jax.tree_util.tree_leaves(want),
                      jax.tree_util.tree_leaves(a1)):
        np.testing.assert_allclose(w, got, rtol=1e-6)


def test_polyak_eval_uses_average_and_trains(ds, tmp_path):
    cfg = Config(dataset="synthetic", batch_size=64, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=16,
                 dropout=0.2, seed=1, polyak_decay=0.99,
                 ckpt_dir=str(tmp_path))
    tr = Trainer(cfg, ds)
    losses = []
    for _ in range(5):
        loss, *_ = tr.train_epoch()
        losses.append(loss)
    assert np.isfinite(losses).all()
    # eval weights are the EMA, distinct from the raw weights
    ep = tr._eval_params()
    assert ep is tr.state.avg_params
    diffs = [np.abs(np.asarray(a) - np.asarray(p)).max()
             for a, p in zip(jax.tree_util.tree_leaves(tr.state.avg_params),
                             jax.tree_util.tree_leaves(tr.state.params))]
    assert max(diffs) > 0
    vloss, vacc, micro, macro, _ = tr.evaluate(ds.val_d)
    assert np.isfinite(vloss)
    # checkpoint round-trips the average
    tr.save()
    tr2 = Trainer(cfg, ds)
    tr2.load(load_history=True)
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.avg_params),
                    jax.tree_util.tree_leaves(tr2.state.avg_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_polyak_disabled_is_none(ds):
    cfg = Config(dataset="synthetic", batch_size=64, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=16, seed=1)
    tr = Trainer(cfg, ds)
    assert tr.state.avg_params is None
    tr.train_epoch()
    assert tr.state.avg_params is None
    assert tr._eval_params() is tr.state.params


def test_checkpoint_polyak_mismatch_reconciles(ds, tmp_path):
    """Resuming a non-polyak checkpoint in a polyak run must re-seed the
    EMA from the restored weights (not crash); the reverse drops it."""
    base = dict(dataset="synthetic", batch_size=64, degree=1, test_degree=1,
                cv=True, test_cv=True, hidden1=16, dropout=0.2, seed=1,
                ckpt_dir=str(tmp_path))
    tr0 = Trainer(Config(**base), ds)
    tr0.train_epoch()
    tr0.save()

    tr1 = Trainer(Config(**base, polyak_decay=0.9), ds)
    tr1.load(load_history=True)
    assert tr1.state.avg_params is not None
    for a, p in zip(jax.tree_util.tree_leaves(tr1.state.avg_params),
                    jax.tree_util.tree_leaves(tr1.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(p))
    loss, *_ = tr1.train_epoch()      # EMA update runs without crashing
    assert np.isfinite(loss)

    tr1.save()
    tr2 = Trainer(Config(**base), ds)  # polyak off again
    tr2.load(load_history=True)
    assert tr2.state.avg_params is None
    loss, *_ = tr2.train_epoch()
    assert np.isfinite(loss)
