"""End-to-end training tests: convergence on planted-signal synthetic data,
checkpoint round-trip, all estimator modes stepping without NaNs."""

import numpy as np
import pytest

import jax.numpy as jnp

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data.loaders import synthetic_dataset
from stochastic_gcn_tpu.training.loop import Trainer


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(num_nodes=300, feature_dim=32, num_classes=5,
                             avg_degree=8, seed=0)


def run_epochs(tr, n):
    accs = []
    for _ in range(n):
        tr.train_epoch()
        _, acc, _, _, _ = tr.evaluate(tr.ds.val_d)
        accs.append(acc)
    return accs


def test_exact_convergence(ds):
    """Exact mode learns the planted signal well above chance (0.2)."""
    cfg = Config(dataset="synthetic", batch_size=50, degree=100,
                 test_degree=100, hidden1=32, dropout=0.2, seed=1)
    tr = Trainer(cfg, ds)
    accs = run_epochs(tr, 30)
    assert max(accs) > 0.6, accs


def test_cv_pp_degree1_convergence(ds):
    """CV+PP at degree=1 — the headline configuration — learns the planted
    signal (plateau ~0.57-0.61 on this graph; chance is 0.2)."""
    cfg = Config(dataset="synthetic", batch_size=128, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=32,
                 dropout=0.2, seed=1)
    tr = Trainer(cfg, ds)
    accs = run_epochs(tr, 40)
    assert max(accs) > 0.55, accs


def test_cvd_convergence(ds):
    cfg = Config(dataset="synthetic", batch_size=128, degree=1,
                 test_degree=1, cv=True, cvd=True, test_cv=True,
                 test_cvd=True, hidden1=32, dropout=0.3, seed=1)
    tr = Trainer(cfg, ds)
    accs = run_epochs(tr, 30)
    assert max(accs) > 0.55, accs


@pytest.mark.parametrize("mode", ["det_dropout", "importance", "reverse",
                                  "layer_norm", "fc2"])
def test_variant_modes_step_finite(ds, mode):
    kw = dict(dataset="synthetic", batch_size=64, degree=2, test_degree=2,
              hidden1=16, seed=1)
    if mode == "det_dropout":
        kw.update(cv=True, test_cv=True, det_dropout=True, dropout=0.5)
    elif mode == "importance":
        kw.update(importance=True, test_importance=True)
    elif mode == "reverse":
        kw.update(reverse=True)
    elif mode == "layer_norm":
        kw.update(layer_norm=True)
    elif mode == "fc2":
        kw.update(num_fc_layers=2)
    tr = Trainer(Config(**kw), ds)
    loss, acc, _, _ = tr.train_epoch()
    assert np.isfinite(loss) and np.isfinite(acc)
    ev = tr.evaluate(ds.val_d)
    assert np.isfinite(ev[0])


def test_multitask_training():
    ds = synthetic_dataset(num_nodes=200, feature_dim=24, num_classes=6,
                           avg_degree=6, seed=3, multitask=True,
                           normalization="graphsage")
    cfg = Config(dataset="ppi", batch_size=64, degree=2, test_degree=2,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0, dropout=0.2, hidden1=32,
                 cv=True, cvd=True, test_cv=True, test_cvd=True, seed=1)
    tr = Trainer(cfg, ds)
    f1s = []
    for _ in range(25):
        tr.train_epoch()
        _, _, micro, _, _ = tr.evaluate(ds.val_d)
        f1s.append(micro)
    assert max(f1s) > 0.6, f1s


def test_checkpoint_roundtrip(tmp_path, ds):
    cfg = Config(dataset="synthetic", batch_size=64, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=16, seed=1,
                 ckpt_dir=str(tmp_path))
    tr = Trainer(cfg, ds)
    tr.train_epoch()
    ev1 = tr.evaluate(ds.val_d)
    tr.save()

    tr2 = Trainer(cfg, ds)
    tr2.load(load_history=True)
    p1 = jax.tree_flatten_params = None
    import jax as _jax
    l1 = _jax.tree_util.tree_leaves(tr.state.params)
    l2 = _jax.tree_util.tree_leaves(tr2.state.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # histories restored too
    h1 = _jax.tree_util.tree_leaves(tr.state.histories)
    h2 = _jax.tree_util.tree_leaves(tr2.state.histories)
    for a, b in zip(h1, h2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_early_stopping_runs(ds):
    cfg = Config(dataset="synthetic", batch_size=128, degree=1,
                 test_degree=1, hidden1=16, epochs=2, early_stopping=2,
                 seed=1, ckpt_dir="/tmp/sgt_test_ckpt")
    tr = Trainer(cfg, ds)
    logs = []
    tr.sgd_train(log=logs.append, max_epochs=6)
    assert any("Optimization Finished!" in str(l) for l in logs)


import jax  # noqa: E402  (used in checkpoint test)


def test_segment_sorted_scatter_matches_plain(ds):
    """The sorted-segment history scatter (scatter_histories fast path)
    writes exactly what a plain .at[field].set would on every real row,
    for a REAL scheduled pack (batch + compacted new-id segments)."""
    from stochastic_gcn_tpu.data.graph import pad_csr
    from stochastic_gcn_tpu.sampler.scheduler import schedule
    from stochastic_gcn_tpu.training.step import scatter_histories

    n = ds.num_data
    graph = pad_csr(ds.train_adj, -1)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.permutation(ds.train_d)[:32].astype(np.int32))
    pack = schedule(jax.random.PRNGKey(3), graph, batch, (2, 2), cv=True)
    d = 5
    hists = tuple(
        (jnp.asarray(rng.normal(size=(n + 1, d)).astype(np.float32)),)
        for _ in pack.fields[:-1])
    news = tuple(
        (jnp.asarray(rng.normal(size=(f.shape[0], d)).astype(np.float32)),)
        for f in pack.fields[:-1])
    out, dropped = scatter_histories(hists, news, pack.fields, n)
    assert int(dropped) == 0
    for (h0,), (nh,), f, (h1,) in zip(hists, news, pack.fields, out):
        ref = h0.at[f].set(nh)
        np.testing.assert_allclose(np.asarray(h1)[:n], np.asarray(ref)[:n],
                                   rtol=0, atol=0)
    # the sorted-segment variant itself (chosen above
    # SORTED_SCATTER_MIN_ROWS; these small fields take the plain path
    # inside scatter_histories) must write identically
    from stochastic_gcn_tpu.training.step import _segment_sorted_scatter
    bounds = sorted(f.shape[0] for f in pack.fields)
    for (h0,), (nh,), f in zip(hists, news, pack.fields):
        got = _segment_sorted_scatter(h0, f, nh, bounds)
        ref = h0.at[f].set(nh)
        np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(ref)[:n],
                                   rtol=0, atol=0)


def test_amt_data_accumulates_across_epochs():
    """`data =` column / data-budget counter is CUMULATIVE over the run
    (reference vrgcn.py:62 +=, models.py:347 init-once)."""
    from stochastic_gcn_tpu.config import Config
    from stochastic_gcn_tpu.data.loaders import synthetic_dataset
    from stochastic_gcn_tpu.training.loop import Trainer
    ds = synthetic_dataset(num_nodes=120, feature_dim=8, num_classes=3,
                           avg_degree=5, seed=0)
    cfg = Config(dataset="synthetic", batch_size=32, degree=2, test_degree=2,
                 hidden1=8, seed=1)
    tr = Trainer(cfg, ds)
    tr.train_epoch()
    one = tr.amt_data
    assert one > 0
    tr.train_epoch()
    assert tr.amt_data > one    # grew, not overwritten
