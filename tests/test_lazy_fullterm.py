"""--lazy_fullterm: epoch-frozen CV anchor (Config.lazy_fullterm).

The a-bar table must be exactly the per-step full-neighborhood term for
every node (same contraction, bulk-chunked), and the lazy training path
must coincide with the eager path in the regime where they provably
agree: batch == all nodes, where every eager anchor is refreshed every
step, so last-visit anchors == epoch-start anchors.  (Reference context:
the full term is gcn/layers.py:355; anchors are the h-bar histories of
vrgcn.py:23-36.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data.graph import flat_csr, pad_csr
from stochastic_gcn_tpu.data.loaders import synthetic_dataset
from stochastic_gcn_tpu.models.aggregators import (full_abar,
                                                   full_neighborhood_mean)
from stochastic_gcn_tpu.training.loop import Trainer


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(num_nodes=96, feature_dim=12, num_classes=4,
                             avg_degree=6, seed=3)


def _rand_hist(n_rows, d, seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(n_rows, d)).astype(np.float32)
    h[-1] = 0.0                       # sentinel row
    return jnp.asarray(h, dtype)


@pytest.mark.parametrize("square", [False, True])
def test_full_abar_matches_per_row_term_padded(ds, square):
    g = pad_csr(ds.full_adj, -1)
    n = ds.num_data
    hist = _rand_hist(n + 1, 8, seed=1)
    abar = full_abar(hist, g, n, square=square, chunk=40)  # forces chunking
    field = jnp.asarray(np.r_[np.arange(0, n, 3), n].astype(np.int32))
    want = full_neighborhood_mean(hist, g, field, square=square)
    np.testing.assert_allclose(np.asarray(abar)[np.asarray(field)],
                               np.asarray(want), rtol=1e-5, atol=1e-6)
    # rows past the sentinel are zero
    assert float(jnp.abs(abar[n]).max()) == 0.0


def test_full_abar_matches_per_row_term_edgelist(ds):
    g = flat_csr(ds.full_adj)
    n = ds.num_data
    hist = _rand_hist(n + 1, 8, seed=2)
    abar = full_abar(hist, g, n, chunk=64)
    field = jnp.asarray(np.arange(n, dtype=np.int32))
    want = full_neighborhood_mean(hist, g, field)
    np.testing.assert_allclose(np.asarray(abar)[:n], np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def _run_epochs(ds, epochs, **kw):
    defaults = dict(dataset="synthetic", batch_size=ds.num_data, hidden1=16,
                    dropout=0.0, seed=7, cv=True, test_cv=True, degree=1,
                    test_degree=1, history_dtype="float32")
    defaults.update(kw)
    cfg = Config(**defaults)
    tr = Trainer(cfg, ds)
    losses = []
    for _ in range(epochs):
        loss, acc, *_ = tr.train_epoch()
        losses.append(float(loss))
    return losses, tr


def test_lazy_matches_eager_when_batch_covers_all_nodes(ds):
    """batch == N: eager last-visit anchors are exactly the epoch-start
    snapshot, so lazy and eager trajectories must coincide (this also
    proves the snapshot survives the scan's in-place history scatters —
    a donation/aliasing regression would diverge epoch 2+)."""
    with jax.default_matmul_precision("float32"):
        l_eager, _ = _run_epochs(ds, 4, lazy_fullterm=False)
        l_lazy, _ = _run_epochs(ds, 4, lazy_fullterm=True)
    np.testing.assert_allclose(l_lazy, l_eager, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("variant", ["cv", "cvd", "det"])
def test_lazy_trains_all_estimator_families(ds, variant):
    kw = dict(lazy_fullterm=True)
    if variant == "cvd":
        kw.update(cvd=True, dropout=0.2)
    elif variant == "det":
        kw.update(det_dropout=True, dropout=0.2)
    losses, tr = _run_epochs(ds, 10, **kw)
    assert np.all(np.isfinite(losses))
    # dropout arms are noisy at toy scale: compare window means
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    # the live histories kept updating under the frozen-anchor epochs
    h = np.asarray(tr.state.histories[0][0])
    assert np.abs(h[: ds.num_data]).max() > 0.0
