"""Aggregator unit tests vs hand-computed numpy oracles (the estimator
math of gcn/layers.py:214-362 / SURVEY.md §2.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stochastic_gcn_tpu.data.graph import pad_csr
from stochastic_gcn_tpu.data.loaders import synthetic_dataset
from stochastic_gcn_tpu.models import aggregators as A
from stochastic_gcn_tpu.sampler.scheduler import LayerSample, schedule


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_dataset(num_nodes=40, feature_dim=8, num_classes=3,
                           avg_degree=4, seed=0)
    g = pad_csr(ds.full_adj)
    batch = jnp.asarray(np.arange(10), jnp.int32)
    pack = schedule(jax.random.PRNGKey(0), g, batch, (g.pad_degree,),
                    cv=True, need_aw=True)
    return ds, g, pack


def dense_sampled_adj(pack, layer, n):
    ls = pack.layers[layer]
    field_in = np.asarray(pack.fields[layer])
    out = np.zeros((ls.slot_pos.shape[0], len(field_in)), np.float32)
    pos, w = np.asarray(ls.slot_pos), np.asarray(ls.slot_w)
    for i in range(pos.shape[0]):
        for s in range(pos.shape[1]):
            if w[i, s] != 0:
                out[i, pos[i, s]] += w[i, s]
    return out


def test_plain_aggregate_matches_dense(setup):
    ds, g, pack = setup
    c_in = pack.fields[0].shape[0]
    h = np.random.default_rng(0).normal(size=(c_in, 8)).astype(np.float32)
    out = A.plain_aggregate(jnp.asarray(h), pack.layers[0], "gcn")
    dense = dense_sampled_adj(pack, 0, ds.num_data)
    np.testing.assert_allclose(np.asarray(out), dense @ h, rtol=1e-4,
                               atol=1e-5)


def test_plain_aggregate_moment_branch(setup):
    """(mu, var) branch squares the adjacency for the variance
    (gcn/layers.py:236-248)."""
    ds, g, pack = setup
    c_in = pack.fields[0].shape[0]
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(c_in, 8)).astype(np.float32)
    var = rng.random((c_in, 8)).astype(np.float32)
    mu_o, var_o = A.plain_aggregate((jnp.asarray(mu), jnp.asarray(var)),
                                    pack.layers[0], "gcn")
    dense = dense_sampled_adj(pack, 0, ds.num_data)
    np.testing.assert_allclose(np.asarray(mu_o), dense @ mu, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_o), (dense ** 2) @ var,
                               rtol=1e-4, atol=1e-5)


def test_vr_aggregate_cv_identity(setup):
    """CV with history == H gives exactly the full (unsampled) aggregation:
    Â_samp·(H-H) + Â_full·H = Â·H."""
    ds, g, pack = setup
    n = ds.num_data
    c_in = pack.fields[0].shape[0]
    rng = np.random.default_rng(1)
    h_nodes = rng.normal(size=(n + 1, 8)).astype(np.float32)
    h_nodes[n] = 0
    field_in = np.asarray(pack.fields[0])
    h_in = h_nodes[field_in]
    out, new_h = A.vr_aggregate(
        jnp.asarray(h_in), pack.layers[0], pack.fields[0], pack.fields[1],
        g, (jnp.asarray(h_nodes),), cvd=False, normalization="gcn")
    f_out = np.asarray(pack.fields[1])
    exact = ds.full_adj.dot(h_nodes[:n])[np.minimum(f_out, n - 1)]
    exact[f_out >= n] = 0  # sentinel rows: Â row of sentinel = 0
    np.testing.assert_allclose(np.asarray(out), exact, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_h[0]), h_in, rtol=1e-6)


def test_vr_aggregate_cv_zero_history_is_plain(setup):
    """CV with zero history reduces to the plain sampled estimator."""
    ds, g, pack = setup
    c_in = pack.fields[0].shape[0]
    h = np.random.default_rng(2).normal(size=(c_in, 8)).astype(np.float32)
    zero_hist = jnp.zeros((ds.num_data + 1, 8), jnp.float32)
    out, _ = A.vr_aggregate(jnp.asarray(h), pack.layers[0], pack.fields[0],
                            pack.fields[1], g, (zero_hist,), cvd=False,
                            normalization="gcn")
    plain = A.plain_aggregate(jnp.asarray(h), pack.layers[0], "gcn")
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain),
                               rtol=1e-4, atol=1e-5)


def test_ema_aggregate(setup):
    ds, g, pack = setup
    c_in = pack.fields[0].shape[0]
    rng = np.random.default_rng(3)
    h = rng.normal(size=(c_in, 8)).astype(np.float32)
    hist = rng.normal(size=(ds.num_data + 1, 8)).astype(np.float32)
    alpha = 0.3
    out, new_h = A.ema_aggregate(jnp.asarray(h), pack.layers[0],
                                 pack.fields[0], (jnp.asarray(hist),),
                                 alpha, "gcn")
    dense = dense_sampled_adj(pack, 0, ds.num_data)
    f_out = np.asarray(pack.fields[1])
    expect = alpha * (dense @ h) + (1 - alpha) * hist[
        np.asarray(pack.fields[0])[:len(f_out)]]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4,
                               atol=1e-5)
    # new history follows the scatter contract: [C_in, d] rows for
    # field_in — Z at the output-field prefix, preserved history after
    f_in = np.asarray(pack.fields[0])
    assert new_h[0].shape[0] == c_in
    np.testing.assert_allclose(np.asarray(new_h[0])[:len(f_out)], expect,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_h[0])[len(f_out):],
                               hist[f_in[len(f_out):]], rtol=1e-6)


def test_full_neighborhood_mean(setup):
    ds, g, pack = setup
    n = ds.num_data
    hist = np.random.default_rng(4).normal(size=(n + 1, 8)) \
        .astype(np.float32)
    hist[n] = 0
    f_out = pack.fields[1]
    out = A.full_neighborhood_mean(jnp.asarray(hist), g, f_out)
    f = np.asarray(f_out)
    expect = np.zeros((len(f), 8), np.float32)
    mask = f < n
    expect[mask] = ds.full_adj.dot(hist[:n])[f[mask]]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4,
                               atol=1e-5)
    # squared variant
    sq = A.full_neighborhood_mean(jnp.asarray(hist), g, f_out, square=True)
    a2 = ds.full_adj.copy()
    a2.data = a2.data ** 2
    expect2 = np.zeros((len(f), 8), np.float32)
    expect2[mask] = a2.dot(hist[:n])[f[mask]]
    np.testing.assert_allclose(np.asarray(sq), expect2, rtol=1e-4,
                               atol=1e-5)


def test_ema_aggregate_matches_formula(setup):
    """EMAAggregator math (gcn/layers.py:260-279):
    Z = alpha * Â_samp·H + (1-alpha) * h̄[field_out]; new history = Z.
    (Unused by the reference drivers but part of its op surface.)"""
    ds, g, pack = setup
    rng = np.random.default_rng(3)
    c_in = pack.fields[0].shape[0]
    f_out = pack.fields[1].shape[0]
    h = rng.normal(size=(c_in, 8)).astype(np.float32)
    hist = rng.normal(size=(ds.num_data + 1, 8)).astype(np.float32)
    hist[-1] = 0.0
    alpha = 0.7
    out, (new_h,) = A.ema_aggregate(jnp.asarray(h), pack.layers[0],
                                    pack.fields[0], (jnp.asarray(hist),),
                                    alpha, "gcn")
    dense = dense_sampled_adj(pack, 0, ds.num_data)
    field_out = np.asarray(pack.fields[0])[:f_out]   # prefix invariant
    expect = alpha * (dense @ h) + (1 - alpha) * hist[field_out]
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4,
                               atol=1e-5)
    # scatter-contract shape: Z at the output-field prefix of field_in
    assert new_h.shape[0] == c_in
    np.testing.assert_allclose(np.asarray(new_h)[:f_out], expect,
                               rtol=1e-4, atol=1e-5)
    # graphsage norm concatenates the self rows
    out2, _ = A.ema_aggregate(jnp.asarray(h), pack.layers[0],
                              pack.fields[0], (jnp.asarray(hist),),
                              alpha, "graphsage")
    np.testing.assert_allclose(np.asarray(out2),
                               np.concatenate([h[:f_out], expect], axis=1),
                               rtol=1e-4, atol=1e-5)
