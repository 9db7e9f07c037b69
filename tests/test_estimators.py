"""Estimator-correctness oracles (SURVEY.md §4):

1. Exact mode (degree >= max degree, dropout 0) equals a dense full-graph
   GCN forward computed independently with plain matrix algebra.
2. CV inference run L+1 times equals exact inference (train.py:339-341).
3. NS/CV predictions are unbiased: E[sampled logits] ~= exact logits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data.loaders import synthetic_dataset
from stochastic_gcn_tpu.training.loop import Trainer


def dense_forward_gcn_pp(ds, params, adj, hidden_act=True):
    """Independent dense implementation of the 2-layer PP model under gcn
    normalization: logits = Â · relu(PP · W0) · W1 where PP = Â·X."""
    pp = np.asarray(adj.dot(ds.feats))
    h = np.maximum(pp @ np.asarray(params["dense0"]["weights"]), 0.0)
    z = adj.dot(h)
    return z @ np.asarray(params["dense1"]["weights"])


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(num_nodes=80, feature_dim=16, num_classes=4,
                             avg_degree=5, seed=0)


def make_trainer(ds, **kw):
    defaults = dict(dataset="synthetic", batch_size=32, hidden1=16,
                    dropout=0.0, seed=1)
    defaults.update(kw)
    return Trainer(Config(**defaults), ds)


def eval_logits(tr, ids):
    """Run the eval step and return softmax predictions on given ids."""
    import numpy as np
    preds = []
    from stochastic_gcn_tpu.sampler.scheduler import MinibatchIterator
    n = tr.ds.num_data
    for start in range(0, len(ids), tr.cfg.test_batch_size):
        chunk = ids[start:start + tr.cfg.test_batch_size]
        batch = MinibatchIterator.pad_batch(chunk, tr.cfg.test_batch_size, n)
        metrics, tr.eval_histories = tr._eval_step(
            tr.state.params, tr.eval_histories, tr.graph_full,
            tr.test_features, tr.labels, tr.importance_test,
            jnp.asarray(batch), tr._next_key())
        preds.append(np.asarray(metrics["pred"])[:len(chunk)])
    return np.vstack(preds)


def test_exact_minibatch_equals_dense_full_batch(ds):
    """Oracle 1: sampled pipeline with degree >= max deg reproduces the
    dense full-graph forward pass exactly."""
    max_deg = int(np.diff(ds.full_adj.indptr).max())
    tr = make_trainer(ds, degree=max_deg + 1, test_degree=max_deg + 1,
                      test_batch_size=40)
    ids = np.arange(ds.num_data, dtype=np.int32)
    with jax.default_matmul_precision("float32"):
        preds = eval_logits(tr, ids)
    logits = dense_forward_gcn_pp(ds, tr.state.params, ds.full_adj)
    expect = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    np.testing.assert_allclose(preds, expect, rtol=2e-3, atol=2e-5)


def test_cv_inference_converges_to_exact(ds):
    """Oracle 2: with test_cv, after num_layers+1 full passes the CV forward
    equals the exact forward (history has converged)."""
    max_deg = int(np.diff(ds.full_adj.indptr).max())
    tr_cv = make_trainer(ds, degree=1, test_degree=1, cv=True, test_cv=True,
                         test_batch_size=40)
    ids = np.arange(ds.num_data, dtype=np.int32)
    with jax.default_matmul_precision("float32"):
        for _ in range(tr_cv.cfg.num_layers + 1):
            preds_cv = eval_logits(tr_cv, ids)
    logits = dense_forward_gcn_pp(ds, tr_cv.state.params, ds.full_adj)
    expect = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    np.testing.assert_allclose(preds_cv, expect, rtol=5e-3, atol=5e-4)


def test_ns_estimator_unbiased_mean(ds):
    """Oracle 3: E over resamples of the NS logits ~= exact logits."""
    max_deg = int(np.diff(ds.full_adj.indptr).max())
    tr = make_trainer(ds, degree=2, test_degree=2, test_batch_size=80)
    ids = np.arange(ds.num_data, dtype=np.int32)
    logits = dense_forward_gcn_pp(ds, tr.state.params, ds.full_adj)
    # mean over many eval resamples; compare pre-softmax via logit trick is
    # nonlinear, so compare the AGGREGATION output instead: use a model with
    # identity second layer?  Simpler: average many runs of the sampled
    # z = Â_s·h and compare to Â·h directly.
    from stochastic_gcn_tpu.sampler.scheduler import schedule
    from stochastic_gcn_tpu.models.aggregators import fanout_gather
    g = tr.graph_full
    h = np.random.default_rng(0).normal(
        size=(ds.num_data + 1, 8)).astype(np.float32)
    h[-1] = 0
    hd = jnp.asarray(h)
    batch = jnp.asarray(np.arange(32), jnp.int32)

    @jax.jit
    def one(key):
        pack = schedule(key, g, batch, (2,), cv=False)
        hin = jnp.take(hd, pack.fields[0], axis=0)
        z = fanout_gather(hin, pack.layers[0].slot_pos,
                          pack.layers[0].slot_w)
        return z

    acc = np.zeros((32, 8), np.float64)
    trials = 400
    for t in range(trials):
        acc += np.asarray(one(jax.random.PRNGKey(t)))
    acc /= trials
    exact = ds.full_adj.dot(h[:-1])[:32]
    scale = np.abs(exact).mean()
    # 8-sigma band: ~0.3% of elements sit outside 3 sigma at 400 trials,
    # so a few-sigma band flakes; 8 sigma is still a tight unbiasedness check
    np.testing.assert_allclose(acc, exact, atol=8 * scale / np.sqrt(trials))


def test_cv_training_reduces_variance_vs_ns(ds):
    """CV predictions have materially smaller variance and bias than NS at
    degree=1 once history is populated — the paper's core claim, measured
    with the gradient-variance harness (train.py:241-277)."""
    tr_ns = make_trainer(ds, degree=1, test_degree=20, dropout=0.0)
    tr_cv = make_trainer(ds, degree=1, test_degree=20, dropout=0.0,
                         cv=True, test_cv=False)
    # a few epochs to populate CV history
    for _ in range(3):
        tr_cv.train_epoch()
        tr_ns.train_epoch()
    r_ns = tr_ns.gradient_variance(times=60, log=lambda *a: None)
    r_cv = tr_cv.gradient_variance(times=60, log=lambda *a: None)
    assert r_cv["pred_stdev"] < 0.6 * r_ns["pred_stdev"]
    # CV bias stays small
    assert r_cv["pred_bias"] < 0.15
    # gradient variance does not blow up vs NS (strict improvement needs a
    # converged history; checked at the prediction level above)
    assert r_cv["grad_stdev"] < 1.5 * r_ns["grad_stdev"]


def dense_forward_gcn_pp_3layer(ds, params, adj):
    """Independent dense 3-layer PP model (gcn norm): two sampled
    aggregation layers after PP — logits = Â·relu(Â·relu(PP·W0)·W1)·W2."""
    pp = np.asarray(adj.dot(ds.feats))
    h = np.maximum(pp @ np.asarray(params["dense0"]["weights"]), 0.0)
    h = np.maximum(np.asarray(adj.dot(h))
                   @ np.asarray(params["dense1"]["weights"]), 0.0)
    return np.asarray(adj.dot(h)) @ np.asarray(params["dense2"]["weights"])


def test_three_layer_cv_trains_and_inference_converges(ds):
    """--num_layers 3 end-to-end (round 4): TWO sampled aggregation layers
    under PP, each with its own history chain; training runs finite, and
    after num_layers+1 = 4 exact eval passes CV inference equals the
    independent dense 3-layer forward (the reference Test() protocol,
    train.py:339-341, at L=3)."""
    tr = make_trainer(ds, num_layers=3, degree=1, test_degree=1, cv=True,
                      test_cv=True, test_batch_size=40)
    assert len(tr.state.histories) == 2          # one per sampled layer
    for _ in range(3):
        loss, *_ = tr.train_epoch()
        assert np.isfinite(loss)
    ids = np.arange(ds.num_data, dtype=np.int32)
    with jax.default_matmul_precision("float32"):
        for _ in range(tr.cfg.num_layers + 1):
            preds_cv = eval_logits(tr, ids)
    logits = dense_forward_gcn_pp_3layer(ds, tr.state.params, ds.full_adj)
    expect = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    np.testing.assert_allclose(preds_cv, expect, rtol=5e-3, atol=5e-4)
