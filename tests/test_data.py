"""Data-layer tests: normalizations, padded graph containers, loaders."""

import numpy as np
import pytest
import scipy.sparse as sp

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data import graph as G
from stochastic_gcn_tpu.data import preprocess as P
from stochastic_gcn_tpu.data.loaders import load_data, synthetic_dataset


def small_adj():
    # 4-node path graph 0-1-2-3 plus edge 0-2
    rows = [0, 1, 1, 2, 2, 3, 0, 2]
    cols = [1, 0, 2, 1, 3, 2, 2, 0]
    return sp.csr_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                         shape=(4, 4))


def test_gcn_normalize_matches_formula():
    a = small_adj()
    out = P.gcn_normalize_adj(a).toarray()
    a_hat = a.toarray() + np.eye(4)
    d = a_hat.sum(1) + 1e-20
    expect = a_hat / np.sqrt(d)[:, None] / np.sqrt(d)[None, :]
    np.testing.assert_allclose(out, expect, rtol=1e-6)
    # symmetric for symmetric input
    np.testing.assert_allclose(out, out.T, rtol=1e-6)


def test_graphsage_normalize_rows_sum_to_one():
    a = small_adj()
    out = P.graphsage_normalize_adj(a).toarray()
    np.testing.assert_allclose(out.sum(1), np.ones(4), rtol=1e-5)
    assert out[0, 0] == 0  # no self loops


def test_row_normalize_features():
    x = sp.csr_matrix(np.array([[1, 3.0], [0, 0], [2, 2]], np.float32))
    out = P.row_normalize_features(x).toarray()
    np.testing.assert_allclose(out[0], [0.25, 0.75], rtol=1e-5)
    np.testing.assert_allclose(out[1], [0, 0])
    np.testing.assert_allclose(out[2], [0.5, 0.5], rtol=1e-5)


def test_pad_csr_roundtrip():
    a = P.gcn_normalize_adj(small_adj())
    g = G.pad_csr(a)
    nbr = np.asarray(g.nbr)
    w = np.asarray(g.w)
    deg = np.asarray(g.deg)
    assert nbr.shape[0] == 5  # N+1 sentinel row
    assert deg[4] == 0
    # reconstruct and compare
    dense = np.zeros((4, 4), np.float32)
    for r in range(4):
        for s in range(g.pad_degree):
            if s < deg[r]:
                dense[r, nbr[r, s]] += w[r, s]
    np.testing.assert_allclose(dense, a.toarray(), rtol=1e-6)


def test_pad_csr_degree_cap():
    a = P.gcn_normalize_adj(small_adj())
    capped = P.cap_adj_degree(a, 2, seed=0)
    assert (np.diff(capped.indptr) <= 2).all()
    g = G.pad_csr(capped, 2)
    assert g.pad_degree == 2


def test_padded_sparse_features_matmul():
    import jax.numpy as jnp
    from stochastic_gcn_tpu.ops.layers import matmul
    x = sp.random(10, 20, density=0.3, format="csr",
                  dtype=np.float32, random_state=0)
    pf = G.pad_sparse_features(x, nnz_cap=32)
    w = np.random.default_rng(0).normal(size=(20, 8)).astype(np.float32)
    out = matmul(pf, jnp.asarray(w))
    # container carries an extra zero sentinel row
    assert out.shape == (11, 8)
    np.testing.assert_allclose(np.asarray(out)[:10], x.toarray() @ w,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[10], np.zeros(8))


def test_subsample_edges_caps_degree():
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 20, size=(200, 2)).astype(np.int32)
    edges = edges[edges[:, 0] != edges[:, 1]]  # self loops count twice
    out = P.subsample_edges(edges, 20, 3, rng)
    deg = np.zeros(20, int)
    for a, b in out:
        deg[a] += 1
        deg[b] += 1
    assert (deg <= 3).all()


def test_synthetic_dataset_shapes():
    ds = synthetic_dataset(num_nodes=100, feature_dim=16, num_classes=4,
                           avg_degree=5, seed=1)
    assert ds.num_data == 100
    assert ds.feats.shape == (100, 16)
    assert ds.labels.shape == (100, 4)
    assert ds.labels.sum(1).max() == 1
    # PP features equal Â·X
    np.testing.assert_allclose(
        np.asarray(ds.train_feats), ds.train_adj.dot(ds.feats), rtol=1e-5)
    # splits partition the nodes
    all_ids = np.concatenate([ds.train_d, ds.val_d, ds.test_d])
    assert len(np.unique(all_ids)) == 100


def test_data_augmentation_block_diagonal():
    ds = synthetic_dataset(num_nodes=30, feature_dim=8, num_classes=3,
                           avg_degree=4, seed=2)
    (n, adj, feats, feats1, labels, tr, va, te) = P.data_augmentation(
        ds.num_data, ds.train_adj, ds.full_adj, ds.feats, ds.labels,
        ds.train_d, ds.val_d.copy(), ds.test_d.copy())
    assert n == 60
    assert adj.shape == (60, 60)
    # no cross-block edges
    assert adj[:30, 30:].nnz == 0 and adj[30:, :30].nnz == 0
    assert (va >= 30).all() and (tr < 30).all()


def test_load_data_synthetic_dispatch(tmp_path):
    cfg = Config(dataset="synthetic:64:8:3", data_dir=str(tmp_path))
    ds = load_data(cfg)
    assert ds.num_data == 64 and ds.feature_dim == 8 and ds.num_classes == 3


def test_npz_cache_roundtrip(tmp_path):
    from stochastic_gcn_tpu.data.loaders import _cache_dataset, _load_cached
    ds = synthetic_dataset(num_nodes=40, feature_dim=6, num_classes=3,
                           avg_degree=4, seed=3)
    path = str(tmp_path / "x.npz")
    _cache_dataset(path, ds, sparse_feats=False)
    ds2 = _load_cached(path)
    np.testing.assert_allclose(ds2.feats, ds.feats)
    np.testing.assert_allclose(ds2.full_adj.toarray(),
                               ds.full_adj.toarray())
    np.testing.assert_array_equal(ds2.train_d, ds.train_d)
