"""Native host library tests: Fenwick sampler, row sampling oracle, CSR
slicing, padded-array builder — and parity between the C++ oracle and the
on-device sampler's semantics."""

import numpy as np
import pytest

from stochastic_gcn_tpu.data.loaders import synthetic_dataset
from stochastic_gcn_tpu.sampler import host


def test_native_lib_builds():
    lib = host.get_lib()
    # the image ships g++; if this fails the numpy fallbacks still work,
    # but we want to know.
    assert lib is not None, "native graphlib failed to build"


def test_mult_sampler_without_replacement():
    probs = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    m = host.MultSampler(probs)
    assert abs(m.total() - 10.0) < 1e-5
    drawn = set()
    for u in [0.05, 0.5, 0.9, 0.2]:
        i = m.query(u)
        assert i not in drawn          # without replacement
        drawn.add(i)
    assert drawn == {0, 1, 2, 3}
    assert m.total() < 1e-5


def test_mult_sampler_distribution():
    """First draw follows the weights."""
    probs = np.array([1.0, 0.0, 3.0], np.float32)
    counts = np.zeros(3)
    rng = np.random.default_rng(0)
    for _ in range(2000):
        m = host.MultSampler(probs)
        counts[m.query(rng.random())] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.25, 0.0, 0.75], atol=0.04)


def test_sample_row_oracle():
    indices = np.arange(10, 20, dtype=np.int32)
    data = np.linspace(0.1, 1.0, 10).astype(np.float32)
    ids, w, scale = host.sample_row(indices, data, k=4, seed=7, sentinel=99)
    assert scale == pytest.approx(10 / 4)
    real = ids[w != 0]
    assert len(set(real.tolist())) == 4
    assert set(real.tolist()) <= set(indices.tolist())
    # weights carry the unbiased rescale
    for i, wi in zip(ids, w):
        if wi != 0:
            np.testing.assert_allclose(wi, data[i - 10] * scale, rtol=1e-5)


def test_sample_row_small_degree():
    indices = np.array([3, 5], np.int32)
    data = np.array([0.5, 0.25], np.float32)
    ids, w, scale = host.sample_row(indices, data, k=4, seed=0, sentinel=9)
    assert scale == 1.0
    assert sorted(ids[:2].tolist()) == [3, 5]
    assert (ids[2:] == 9).all() and (w[2:] == 0).all()


def test_csr_slice_matches_scipy():
    ds = synthetic_dataset(num_nodes=60, feature_dim=8, num_classes=3,
                           avg_degree=5, seed=0)
    rows = np.array([5, 0, 17, 33], np.int32)
    idx, vals, shape = host.csr_slice(ds.full_adj, rows)
    expect = ds.full_adj[rows].toarray()
    got = np.zeros(shape, np.float32)
    got[idx[:, 0], idx[:, 1]] = vals
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_dense_slice():
    x = np.random.default_rng(0).normal(size=(30, 6)).astype(np.float32)
    rows = np.array([4, 4, 0, 29], np.int32)
    np.testing.assert_array_equal(host.dense_slice(x, rows), x[rows])


def test_build_padded_matches_python():
    import jax.numpy as jnp
    from stochastic_gcn_tpu.data.graph import pad_csr
    ds = synthetic_dataset(num_nodes=50, feature_dim=8, num_classes=3,
                           avg_degree=5, seed=0)
    out, dcap = host.build_padded_arrays(ds.full_adj, -1)
    if out is None:
        pytest.skip("native lib unavailable")
    nbr, w, deg = out
    g = pad_csr(ds.full_adj, -1)
    assert dcap == g.pad_degree
    np.testing.assert_array_equal(nbr, np.asarray(g.nbr))
    np.testing.assert_allclose(w, np.asarray(g.w), rtol=1e-6)
    np.testing.assert_array_equal(deg, np.asarray(g.deg))


def test_build_padded_degree_cap_reservoir():
    ds = synthetic_dataset(num_nodes=50, feature_dim=8, num_classes=3,
                           avg_degree=12, seed=0)
    out, dcap = host.build_padded_arrays(ds.full_adj, 4, cap_random=True,
                                         seed=3)
    if out is None:
        pytest.skip("native lib unavailable")
    nbr, w, deg = out
    assert dcap == 4
    assert (deg <= 4).all()
    # sampled entries are a subset of the true row
    a = ds.full_adj
    for r in range(10):
        row = set(a.indices[a.indptr[r]:a.indptr[r + 1]].tolist())
        got = set(nbr[r, :deg[r]].tolist())
        assert got <= row
