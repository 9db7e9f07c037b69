"""Loader tests against synthesized on-disk fixtures in the reference's
three dataset formats (Planetoid pickles, GraphSAGE JSON, YouTube CSV)."""

import json
import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data.loaders import (load_gcn_data,
                                             load_graphsage_data,
                                             load_youtube_data)


def write_planetoid_fixture(d, name="cora", n_train=5, n_rest=520,
                            n_test=8, dim=12, ncls=3, seed=0,
                            isolated=0):
    """Minimal ind.* files.  allx covers train+rest, tx the test nodes;
    test.index is shuffled to exercise the reorder logic.  ``isolated``
    drops that many ids from test.index (and rows from tx/ty) while the
    graph still spans the full range — the citeseer isolated-node case."""
    rng = np.random.default_rng(seed)
    n_allx = n_train + n_rest
    n = n_allx + n_test

    def feats(k):
        return sp.csr_matrix(rng.random((k, dim)).astype(np.float32)
                             * (rng.random((k, dim)) < 0.3))

    def labels(k):
        y = np.zeros((k, ncls), np.float32)
        y[np.arange(k), rng.integers(0, ncls, k)] = 1
        return y

    allx = feats(n_allx)
    x = allx[:n_train]
    ally = labels(n_allx)
    y = ally[:n_train]
    graph = {i: [] for i in range(n)}
    for _ in range(3 * n):
        a, b = rng.integers(0, n, 2)
        if a != b:
            graph[int(a)].append(int(b))
            graph[int(b)].append(int(a))
    test_idx = list(range(n_allx, n))
    if isolated:
        # keep the extremes so the contiguous range is preserved; drop
        # interior ids (their tx/ty rows are absent too)
        drop = set(test_idx[1:1 + isolated])
        test_idx = [t for t in test_idx if t not in drop]
    tx = feats(len(test_idx))
    ty = labels(len(test_idx))
    rng.shuffle(test_idx)

    for nm, obj in [("x", x), ("y", y), ("tx", tx), ("ty", ty),
                    ("allx", allx), ("ally", ally), ("graph", graph)]:
        with open(os.path.join(d, f"ind.{name}.{nm}"), "wb") as f:
            pickle.dump(obj, f, protocol=2)
    with open(os.path.join(d, f"ind.{name}.test.index"), "w") as f:
        f.write("\n".join(str(i) for i in test_idx) + "\n")
    return n, dim, ncls


def test_planetoid_loader(tmp_path):
    d = str(tmp_path)
    n, dim, ncls = write_planetoid_fixture(d)
    cfg = Config(dataset="cora", data_dir=d)
    ds = load_gcn_data("cora", cfg)
    assert ds.num_data == n
    assert ds.feats.shape == (n, dim)
    assert ds.labels.shape == (n, ncls)
    # citation format: train graph == full graph (utils.py:151)
    assert (ds.train_adj != ds.full_adj).nnz == 0
    # gcn normalization is symmetric with self loops
    a = ds.full_adj.toarray()
    np.testing.assert_allclose(a, a.T, atol=1e-6)
    assert (np.diag(a) > 0).all()
    # splits: train prefix, 500-wide val, shuffled-test reordered
    assert len(ds.train_d) == 5 and len(ds.val_d) == 500
    assert len(ds.test_d) == 8
    # PP features = Â·X
    np.testing.assert_allclose(
        np.asarray(ds.train_feats.todense()),
        np.asarray(ds.train_adj.dot(ds.feats).todense()), rtol=1e-5)
    # cache round trip
    ds2 = load_gcn_data("cora", cfg)
    np.testing.assert_allclose(np.asarray(ds2.feats.todense()),
                               np.asarray(ds.feats.todense()))


def test_planetoid_citeseer_isolated_nodes(tmp_path):
    """citeseer branch (gcn/utils.py:67-76): ids missing from test.index get
    zero feature/label rows inserted at the right positions."""
    d = str(tmp_path)
    n, dim, ncls = write_planetoid_fixture(d, name="citeseer", isolated=3)
    cfg = Config(dataset="citeseer", data_dir=d)
    ds = load_gcn_data("citeseer", cfg)
    assert ds.num_data == n
    # the three dropped ids (right after the first test id) have zero labels
    first_test = n - 8
    missing = [first_test + 1, first_test + 2, first_test + 3]
    assert np.all(ds.labels[missing] == 0)
    # present test ids keep nonzero labels
    assert ds.labels[first_test].sum() == 1
    assert len(ds.test_d) == 5


def test_planetoid_trains_end_to_end(tmp_path):
    d = str(tmp_path)
    write_planetoid_fixture(d)
    cfg = Config(dataset="cora", data_dir=d, batch_size=64, degree=2,
                 test_degree=2, hidden1=8, epochs=1)
    ds = load_gcn_data("cora", cfg)
    from stochastic_gcn_tpu.training.loop import Trainer
    tr = Trainer(cfg, ds)   # sparse features -> PaddedSparseFeatures path
    loss, acc, _, _ = tr.train_epoch()
    assert np.isfinite(loss)
    ev = tr.evaluate(ds.val_d[:100])
    assert np.isfinite(ev[0])


def write_graphsage_fixture(d, prefix="toy", n=40, dim=6, ncls=4,
                            multilabel=False, seed=0):
    rng = np.random.default_rng(seed)
    ids = [f"n{i}" for i in range(n)]
    val = rng.random(n) < 0.2
    test = (~val) & (rng.random(n) < 0.2)
    nodes = [dict(id=ids[i], val=bool(val[i]), test=bool(test[i]))
             for i in range(n)]
    links = []
    for _ in range(n * 3):
        a, b = rng.integers(0, n, 2)
        if a != b:
            links.append(dict(source=int(a), target=int(b)))
    G = dict(directed=False, multigraph=False, graph={}, nodes=nodes,
             links=links)
    id_map = {ids[i]: i for i in range(n)}
    if multilabel:
        class_map = {ids[i]: rng.integers(0, 2, ncls).tolist()
                     for i in range(n)}
    else:
        class_map = {ids[i]: int(rng.integers(0, ncls)) for i in range(n)}
    feats = rng.normal(size=(n, dim)).astype(np.float32)

    p = os.path.join(d, prefix)
    json.dump(G, open(p + "-G.json", "w"))
    json.dump(id_map, open(p + "-id_map.json", "w"))
    json.dump(class_map, open(p + "-class_map.json", "w"))
    np.save(p + "-feats.npy", feats)
    return p, n, dim, ncls, val, test


def test_graphsage_loader(tmp_path):
    d = str(tmp_path)
    p, n, dim, ncls, val, test = write_graphsage_fixture(d)
    cfg = Config(dataset="toy", normalization="graphsage", data_dir=d)
    ds = load_graphsage_data(p, cfg)
    assert ds.num_data == n
    assert ds.labels.shape == (n, ncls)
    assert set(ds.val_d) == set(np.nonzero(val)[0])
    assert set(ds.test_d) == set(np.nonzero(test)[0])
    # train adjacency only contains train-train edges
    tr_set = set(ds.train_d.tolist())
    coo = ds.train_adj.tocoo()
    assert all(r in tr_set and c in tr_set
               for r, c in zip(coo.row, coo.col))
    # graphsage row normalization
    rowsum = np.asarray(ds.full_adj.sum(1)).flatten()
    nz = rowsum > 0
    np.testing.assert_allclose(rowsum[nz], 1.0, rtol=1e-5)
    # features standardized over train nodes
    mu = ds.feats[ds.train_d].mean(0)
    np.testing.assert_allclose(mu, 0.0, atol=1e-5)


def test_graphsage_multilabel(tmp_path):
    d = str(tmp_path)
    p, n, dim, ncls, *_ = write_graphsage_fixture(d, multilabel=True)
    cfg = Config(dataset="toy", normalization="graphsage", data_dir=d)
    ds = load_graphsage_data(p, cfg)
    assert ds.labels.shape == (n, ncls)
    assert ds.labels.max() <= 1


def test_graphsage_max_degree(tmp_path):
    d = str(tmp_path)
    p, n, *_ = write_graphsage_fixture(d, n=30)
    cfg = Config(dataset="toy", normalization="graphsage", data_dir=d,
                 max_degree=3)
    ds = load_graphsage_data(p, cfg)
    deg = np.diff(ds.full_adj.indptr)
    assert deg.max() <= 2 * 3  # symmetrization can double capped counts


def test_youtube_loader(tmp_path):
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "yt"))
    rng = np.random.default_rng(0)
    n = 30
    edges = [(int(a) + 1, int(b) + 1)
             for a, b in rng.integers(0, n, (120, 2)) if a != b]
    with open(os.path.join(d, "yt", "edges.csv"), "w") as f:
        f.writelines(f"{a},{b}\n" for a, b in edges)
    with open(os.path.join(d, "yt", "group-edges.csv"), "w") as f:
        for i in range(1, n + 1):
            f.writelines(f"{i},{int(rng.integers(1, 48))}\n")
    cfg = Config(dataset="youtube", data_dir=d)
    ds = load_youtube_data("yt", 0.8, cfg)
    # data_augmentation doubles the graph block-diagonally
    assert ds.num_data == 2 * n
    assert ds.labels.shape == (2 * n, 47)
    assert (ds.val_d >= n).all() and (ds.train_d < n).all()


def test_mlp_baseline(tmp_path):
    """NeighbourMLP (reference gcn/mlp.py, repaired) trains."""
    from stochastic_gcn_tpu.data.loaders import synthetic_dataset
    from stochastic_gcn_tpu.models.mlp import MLPTrainer, multihop_features
    ds = synthetic_dataset(num_nodes=120, feature_dim=10, num_classes=3,
                           avg_degree=5, seed=0)
    cfg = Config(dataset="synthetic", model="mlp", batch_size=32,
                 num_layers=2, num_fc_layers=2, hidden1=16, epochs=2)
    mh = multihop_features(ds.feats, ds.full_adj, 2)
    assert mh.shape == (120, 30)
    tr = MLPTrainer(cfg, ds)
    accs = []
    for _ in range(10):
        tr.train_epoch()
        accs.append(tr.evaluate(ds.val_d)[1])
    assert max(accs) > 0.4  # learns above chance (1/3)
