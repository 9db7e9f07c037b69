"""Two-tier CV full-neighborhood contraction (aggregators.tiered_full_contract).

The tiered path must be EXACT vs the plain [F, Dcap] contraction for any
batch — including fields whose big-row count overflows the static tail
capacity (the lax.cond fallback) — and differentiate identically, since it
sits inside the CV/CVD estimators whose convergence-to-exact property
depends on the full term being the true Â_full·h̄ (reference semantics:
gcn/layers.py:355).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stochastic_gcn_tpu.data.graph import choose_tier, pad_csr
from stochastic_gcn_tpu.models import aggregators
from stochastic_gcn_tpu.data import preprocess as P
from stochastic_gcn_tpu.models.aggregators import (full_neighborhood_mean,
                                                   tiered_full_contract)


@pytest.fixture(autouse=True)
def _engage_tier_on_small_fields(monkeypatch):
    """Production gates the tier at >= TIER_MIN_ROWS field rows (it loses
    in the dispatch-latency regime); these tests exercise the math at toy
    sizes, so drop the gate."""
    monkeypatch.setattr(aggregators, "TIER_MIN_ROWS", 0)


def _skewed_graph(n=400, seed=0):
    rng = np.random.default_rng(seed)
    # most rows degree ~4-12, a few hubs up to ~64
    deg = np.minimum(4 + rng.geometric(0.25, n), 12)
    hubs = rng.choice(n, size=n // 20, replace=False)
    deg[hubs] = rng.integers(40, 65, size=hubs.size)
    src = np.repeat(np.arange(n, dtype=np.int32), deg)
    dst = rng.integers(0, n, size=src.shape[0], dtype=np.int32)
    keep = src != dst
    edges = np.stack([src[keep], dst[keep]], 1)
    adj01 = (P.adj_from_edges(edges, n) > 0).astype(np.float32)
    return P.graphsage_normalize_adj(adj01)


def test_choose_tier_picks_narrow_width():
    adj = _skewed_graph()
    deg = np.diff(adj.tocsr().indptr)
    w1, frac = choose_tier(deg, int(deg.max()))
    assert 8 <= w1 < deg.max()
    assert 0.0 < frac <= 1.0
    # covers the bulk: most nodes fit the main pass
    assert (deg <= w1).mean() > 0.5


def test_tiered_matches_plain_forward_and_grad():
    adj = _skewed_graph()
    g = pad_csr(adj, -1, tier=True)
    assert g.tier_w > 0, "tier should engage on a skewed graph"
    g_off = dataclasses.replace(g, tier_w=-1)

    rng = np.random.default_rng(1)
    n = g.num_nodes
    hist = jnp.asarray(rng.normal(size=(n + 1, 16)).astype(np.float32)
                       ).at[n].set(0.0)
    field = jnp.asarray(rng.integers(0, n, size=128, dtype=np.int32))

    f_tier = jax.jit(lambda h, f: full_neighborhood_mean(h, g, f))
    f_plain = jax.jit(lambda h, f: full_neighborhood_mean(h, g_off, f))
    out_t = f_tier(hist, field)
    out_p = f_plain(hist, field)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)

    gt = jax.grad(lambda h: jnp.sum(jnp.sin(f_tier(h, field))))(hist)
    gp = jax.grad(lambda h: jnp.sum(jnp.sin(f_plain(h, field))))(hist)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gp),
                               rtol=1e-5, atol=1e-5)


def test_tiered_square_branch_matches():
    adj = _skewed_graph(seed=3)
    g = pad_csr(adj, -1, tier=True)
    g_off = dataclasses.replace(g, tier_w=-1)
    rng = np.random.default_rng(2)
    n = g.num_nodes
    hist = jnp.asarray(rng.uniform(size=(n + 1, 8)).astype(np.float32)
                       ).at[n].set(0.0)
    field = jnp.asarray(rng.integers(0, n, size=64, dtype=np.int32))
    out_t = full_neighborhood_mean(hist, g, field, square=True)
    out_p = full_neighborhood_mean(hist, g_off, field, square=True)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_p),
                               rtol=1e-5, atol=1e-6)


def test_overflow_falls_back_exactly():
    """A field made ENTIRELY of big rows overflows any sane tail capacity;
    the lax.cond full-width fallback must keep the result exact."""
    adj = _skewed_graph(seed=4)
    g = pad_csr(adj, -1, tier=True)
    deg = np.asarray(jax.device_get(g.deg))[:-1]
    big_ids = np.where(deg > g.tier_w)[0]
    assert big_ids.size >= 8
    field = jnp.asarray(np.resize(big_ids, 96).astype(np.int32))

    rng = np.random.default_rng(5)
    n = g.num_nodes
    hist = jnp.asarray(rng.normal(size=(n + 1, 8)).astype(np.float32)
                       ).at[n].set(0.0)
    # force a tiny static capacity so the cond takes the fallback branch
    g_tiny = dataclasses.replace(g, tier_frac=1e-6)
    fnbr = jnp.take(g.nbr, field, axis=0)
    fw = jnp.take(g.w, field, axis=0)
    fdeg = jnp.take(g.deg, field, axis=0)
    out_t = tiered_full_contract(hist, fnbr, fw, fdeg, g_tiny.tier_w,
                                 g_tiny.tier_frac)
    out_p = jnp.einsum("fk,fkd->fd", fw, jnp.take(hist, fnbr, axis=0))
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)
    # and that capacity really was smaller than the big-row count
    from stochastic_gcn_tpu.models.aggregators import _tier_cap
    big_cap = _tier_cap(int(field.shape[0]), 1e-6)
    assert int(jnp.sum(fdeg > g.tier_w)) > big_cap


def test_tiered_edgelist_matches_plain():
    """FlatGraph two-tier windows == full-width windows, forward + grad,
    including the start-offset tail windows."""
    from stochastic_gcn_tpu.data.graph import flat_csr

    adj = _skewed_graph(seed=6)
    g = flat_csr(adj, edge_mult=16.0, tier=True)   # budget covers all rows
    assert g.tier_w > 0
    g_off = dataclasses.replace(g, tier_w=-1)

    rng = np.random.default_rng(8)
    n = g.num_nodes
    hist = jnp.asarray(rng.normal(size=(n + 1, 12)).astype(np.float32)
                       ).at[n].set(0.0)
    field = jnp.asarray(rng.integers(0, n, size=96, dtype=np.int32))

    for square in (False, True):
        out_t = full_neighborhood_mean(hist, g, field, square=square)
        out_p = full_neighborhood_mean(hist, g_off, field, square=square)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_p),
                                   rtol=1e-5, atol=1e-5)

    gt = jax.grad(lambda h: jnp.sum(
        jnp.sin(full_neighborhood_mean(h, g, field))))(hist)
    gp = jax.grad(lambda h: jnp.sum(
        jnp.sin(full_neighborhood_mean(h, g_off, field))))(hist)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gp),
                               rtol=1e-5, atol=1e-5)


def test_tiered_edgelist_overflow_falls_back():
    """All-big-row field on a FlatGraph: cond fallback stays exact."""
    from stochastic_gcn_tpu.data.graph import flat_csr

    adj = _skewed_graph(seed=9)
    g = flat_csr(adj, edge_mult=16.0, tier=True)
    deg = np.asarray(jax.device_get(g.deg))[:-1]
    big_ids = np.where(deg > g.tier_w)[0]
    assert big_ids.size >= 8
    field = jnp.asarray(np.resize(big_ids, 64).astype(np.int32))
    g_tiny = dataclasses.replace(g, tier_frac=1e-6)
    g_off = dataclasses.replace(g, tier_w=-1)

    rng = np.random.default_rng(10)
    n = g.num_nodes
    hist = jnp.asarray(rng.normal(size=(n + 1, 8)).astype(np.float32)
                       ).at[n].set(0.0)
    out_t = full_neighborhood_mean(hist, g_tiny, field)
    out_p = full_neighborhood_mean(hist, g_off, field)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)


def test_manual_width_override_both_layouts():
    """--fadj_tier_w overrides the cost model on BOTH graph layouts; an
    off-block-grid width is rejected on the edgelist (windows must be
    block-aligned) rather than silently misaligned."""
    from stochastic_gcn_tpu.data.graph import flat_csr

    adj = _skewed_graph(seed=11)
    gp = pad_csr(adj, -1, tier=True, tier_w=16)
    assert gp.tier_w == 16 and gp.tier_frac > 0
    gf = flat_csr(adj, edge_mult=16.0, tier=True, tier_w=16)
    assert gf.tier_w == 16
    assert flat_csr(adj, edge_mult=16.0, tier=True, tier_w=12).tier_w == -1

    # overridden width still contracts exactly
    rng = np.random.default_rng(12)
    n = gp.num_nodes
    hist = jnp.asarray(rng.normal(size=(n + 1, 8)).astype(np.float32)
                       ).at[n].set(0.0)
    field = jnp.asarray(rng.integers(0, n, size=64, dtype=np.int32))
    for g in (gp, gf):
        out_t = full_neighborhood_mean(hist, g, field)
        out_p = full_neighborhood_mean(
            hist, dataclasses.replace(g, tier_w=-1), field)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_p),
                                   rtol=1e-5, atol=1e-5)


def test_trainer_trajectory_parity():
    """End-to-end: CV training with --fadj_tier matches the untiered
    trajectory (same seeds; fp reassociation tolerance only)."""
    from stochastic_gcn_tpu.config import Config
    from stochastic_gcn_tpu.data.loaders import load_data
    from stochastic_gcn_tpu.training.loop import Trainer

    base = dict(dataset="synthetic:300:16:4", batch_size=64, degree=1,
                test_degree=1, cv=True, test_cv=True,
                early_stopping=100, hidden1=16, seed=7, dropout=0.0)
    losses = {}
    for tier in (False, True):
        cfg = Config(**base, fadj_tier=tier)
        tr = Trainer(cfg, load_data(cfg))
        ls = []
        for _ in range(3):
            loss, *_ = tr.train_epoch()
            ls.append(float(loss))
        losses[tier] = ls
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=2e-3, atol=2e-4)


def test_big_row_positions_topk_equals_cumsum():
    """Round 4: the tier's big-row position buffer has two lowerings —
    one stable lax.top_k over the flags (default) vs the round-3
    cumsum+scatter chain.  Both must pick the FIRST big_cap flagged
    positions (top_k ties break by ascending index), identical down to
    the overflow drop set."""
    import numpy as np
    from stochastic_gcn_tpu.models import aggregators as A

    rng = np.random.default_rng(3)
    old = A.TIER_POS_IMPL
    try:
        for F, cap in ((64, 8), (64, 64), (100, 17), (256, 1)):
            flags = jnp.asarray(rng.random(F) < 0.3)
            A.TIER_POS_IMPL = "topk"
            p1, n1 = A._big_row_positions(flags, cap)
            A.TIER_POS_IMPL = "cumsum"
            p2, n2 = A._big_row_positions(flags, cap)
            assert int(n1) == int(n2)
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    finally:
        A.TIER_POS_IMPL = old
