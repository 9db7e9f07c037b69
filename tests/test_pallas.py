"""Pallas kernel tests (interpret mode on CPU): numerical equality vs the
XLA gather+einsum reference paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stochastic_gcn_tpu.ops import pallas_spmm as PS


@pytest.fixture
def data(rng):
    c, d, f, k = 100, 32, 24, 5
    x = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, c, (f, k)).astype(np.int32))
    w = jnp.asarray((rng.random((f, k)) * (rng.random((f, k)) < 0.7))
                    .astype(np.float32))
    return x, pos, w


def test_fanout_aggregate_matches_xla(data):
    x, pos, w = data
    out = PS.fanout_aggregate(x, pos, w, interpret=True)
    ref = PS.fanout_aggregate_xla(x, pos, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fanout_aggregate_ragged_f(rng):
    # F not a multiple of the tile size exercises the padding path
    c, d, f, k = 50, 16, 13, 3
    x = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, c, (f, k)).astype(np.int32))
    w = jnp.asarray(rng.random((f, k)).astype(np.float32))
    out = PS.fanout_aggregate(x, pos, w, interpret=True)
    ref = PS.fanout_aggregate_xla(x, pos, w)
    assert out.shape == (f, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_hbm_gather_aggregate_matches_xla(rng):
    n, d, f, k = 300, 32, 16, 11
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (f, k)).astype(np.int32))
    w = jnp.asarray(rng.random((f, k)).astype(np.float32))
    out = PS.hbm_gather_aggregate(table, idx, w, interpret=True)
    ref = PS.hbm_gather_aggregate_xla(table, idx, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_zero_weight_slots_ignore_index(rng):
    """Masked (weight-0) slots contribute nothing regardless of index."""
    c, d, f, k = 40, 8, 8, 4
    x = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, c, (f, k)).astype(np.int32))
    w = np.zeros((f, k), np.float32)
    w[:, 0] = 1.0
    out = PS.fanout_aggregate(x, pos, jnp.asarray(w), interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x)[np.asarray(pos)[:, 0]],
                               rtol=1e-6)
