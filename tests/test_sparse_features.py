"""NELL-style high-dimensional sparse feature path: one-hot-ish features at
tens of thousands of dimensions, trained through the PaddedSparseFeatures
embedding-gather route (first dense = gather-sum, never densified)."""

import numpy as np
import pytest
import scipy.sparse as sp

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data.graph import Dataset
from stochastic_gcn_tpu.data.loaders import synthetic_dataset
from stochastic_gcn_tpu.data.preprocess import compute_pp_features
from stochastic_gcn_tpu.training.loop import Trainer


@pytest.fixture(scope="module")
def nell_like():
    """200 nodes, 20k-dim features with ~2 nnz/row (NELL shape)."""
    base = synthetic_dataset(num_nodes=200, feature_dim=8, num_classes=4,
                             avg_degree=5, seed=0)
    rng = np.random.default_rng(0)
    n, dim = 200, 20_000
    rows = np.repeat(np.arange(n), 2)
    cols = rng.integers(0, dim, 2 * n)
    vals = rng.random(2 * n).astype(np.float32) + 0.5
    feats = sp.csr_matrix((vals, (rows, cols)), shape=(n, dim))
    train_feats = compute_pp_features(base.train_adj, feats)
    test_feats = compute_pp_features(base.full_adj, feats)
    return Dataset(num_data=n, train_adj=base.train_adj,
                   full_adj=base.full_adj, feats=feats,
                   train_feats=train_feats.tocsr(),
                   test_feats=test_feats.tocsr(), labels=base.labels,
                   train_d=base.train_d, val_d=base.val_d,
                   test_d=base.test_d)


def test_sparse_input_stays_sparse(nell_like):
    """With PP + sparse input the device features are padded-sparse (the
    20k-dim matrix is never densified)."""
    from stochastic_gcn_tpu.data.graph import PaddedSparseFeatures
    cfg = Config(dataset="synthetic", batch_size=64, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=64,
                 dropout=0.1, weight_decay=1e-5, seed=1)
    tr = Trainer(cfg, nell_like)
    assert isinstance(tr.train_features, PaddedSparseFeatures)
    assert tr.train_features.dim == 20_000
    loss, acc, _, _ = tr.train_epoch()
    assert np.isfinite(loss)
    ev = tr.evaluate(nell_like.val_d)
    assert np.isfinite(ev[0])


def test_sparse_nell_recipe_converges(nell_like):
    """NELL recipe hyperparameters (configs/nell.sh) learn the planted
    signal through the sparse path."""
    cfg = Config(dataset="synthetic", batch_size=64, degree=2,
                 test_degree=2, hidden1=64, dropout=0.1, weight_decay=1e-5,
                 seed=1)
    tr = Trainer(cfg, nell_like)
    losses = []
    for _ in range(12):
        loss, *_ = tr.train_epoch()
        losses.append(loss)
    assert losses[-1] < losses[0]


def test_dense_input_flag_densifies(nell_like):
    """--dense_input converts sparse features to dense rows
    (reference train.py:32)."""
    import jax
    cfg = Config(dataset="synthetic", batch_size=64, degree=1,
                 test_degree=1, hidden1=16, seed=1, dense_input=True)
    tr = Trainer(cfg, nell_like)
    assert isinstance(tr.train_features, jax.Array)
    loss, *_ = tr.train_epoch()
    assert np.isfinite(loss)


@pytest.mark.parametrize("variant", ["det_dropout", "cvd"])
def test_sparse_input_estimator_variants(nell_like, variant):
    """det_dropout's (mu, var) first layer and CVD's dual-stream first
    layer must accept padded-sparse inputs (the reference's
    dot(..., sparse=True) path, gcn/layers.py:176-178, 383-388) — round-4
    regression: det_dropout crashed on sparse Cora-replica features."""
    kw = dict(dataset="synthetic", batch_size=64, degree=1, test_degree=1,
              cv=True, test_cv=True, hidden1=32, dropout=0.2,
              layer_norm=True, seed=1)
    if variant == "det_dropout":
        kw.update(det_dropout=True)
    else:
        kw.update(cvd=True, test_cvd=True)
    tr = Trainer(Config(**kw), nell_like)
    from stochastic_gcn_tpu.data.graph import PaddedSparseFeatures
    assert isinstance(tr.train_features, PaddedSparseFeatures)
    loss, acc, _, _ = tr.train_epoch()
    assert np.isfinite(loss)
    ev = tr.evaluate(nell_like.val_d)
    assert np.isfinite(ev[0])
