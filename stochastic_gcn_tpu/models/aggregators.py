"""Functional aggregation ops — the estimator family.

Re-implements the reference aggregators (gcn/layers.py:214-362) over the
static-shape fanout-slot representation produced by the on-device scheduler:

* sampled SpMM  ``Â_samp · X``  -> dense fanout contraction
  ``einsum('fk,fkd->fd', w, X[slot_pos])``
* full-neighborhood SpMM ``Â_full · h̄`` -> padded-row contraction over the
  device-resident graph, gathering history rows directly by node id (the
  reference's ffield/ifield indirection disappears because history lives in
  HBM at [N+1, d]).

All math matches §2.4 of SURVEY.md / gcn/layers.py:282-362 term by term.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..data.graph import PaddedGraph
from ..sampler.scheduler import LayerSample


def fanout_gather(x: jax.Array, slot_pos: jax.Array,
                  slot_w: jax.Array) -> jax.Array:
    """[C_in, d], [F, k], [F, k] -> [F, d]: out[f] = sum_s w[f,s]*x[pos[f,s]].

    The sampled-adjacency SpMM (reference: tf.sparse_tensor_dense_matmul at
    gcn/layers.py:34) in gather+contract form — static shapes, no scatter.
    """
    g = jnp.take(x, slot_pos, axis=0)          # [F, k, d]
    return jnp.einsum("fk,fkd->fd", slot_w, g)


def full_neighborhood_mean(hist: jax.Array, graph: PaddedGraph,
                           field_out: jax.Array, square: bool = False,
                           use_pallas: bool = False) -> jax.Array:
    """``(Â_full · h̄)[field_out]``: padded full-row contraction.

    hist: [N+1, d] device-resident history (zero sentinel row).
    Equivalent to reference ``dot(fadj, gather(hist, ffield))``
    (gcn/layers.py:355).  ``square=True`` uses squared edge weights (the
    det-dropout variance term, gcn/layers.py:338).

    ``use_pallas`` selects the streaming-gather kernel: true-f32
    accumulation (XLA's default-precision einsum reduces in bf16 passes)
    at ~3x the op time — see ops/pallas_spmm.py.
    """
    fnbr = jnp.take(graph.nbr, field_out, axis=0)     # [F, Dcap]
    fw = jnp.take(graph.w, field_out, axis=0)
    if square:
        fw = jnp.square(fw)
    if use_pallas:
        from ..ops.pallas_spmm import hbm_gather_aggregate
        interp = jax.default_backend() == "cpu"
        return hbm_gather_aggregate(hist.astype(jnp.float32), fnbr,
                                    fw, interpret=interp)
    rows = jnp.take(hist, fnbr, axis=0)               # [F, Dcap, d]
    return jnp.einsum("fk,fkd->fd", fw, rows)


def ema_aggregate(inputs, ls: LayerSample, field_in: jax.Array,
                  history: Tuple[jax.Array, ...], alpha: float,
                  normalization: str):
    """EMAAggregator (gcn/layers.py:260-279): exponential-moving-average
    blend of the sampled aggregation with history.  Unused by the reference
    drivers but part of its op surface; provided for completeness.

    Z = alpha * Â_samp·H + (1-alpha) * h̄[field_out];  new history = Z.
    """
    f = ls.slot_pos.shape[0]
    a_hat = fanout_gather(inputs, ls.slot_pos, ls.slot_w)
    hist_rows = jnp.take(history[0], field_in[:f], axis=0)
    a_nbr = a_hat * alpha + hist_rows * (1.0 - alpha)
    return _self_concat(normalization, inputs[:f], a_nbr), (a_nbr,)


def _self_concat(normalization: str, self_part, nbr_part):
    if normalization == "gcn":
        return nbr_part
    return jnp.concatenate((self_part, nbr_part), axis=1)


def plain_aggregate(inputs, ls: LayerSample, normalization: str):
    """PlainAggregator (gcn/layers.py:214-257): Z = Â_samp·H, with self
    concat under graphsage normalization and a (mu, var) moment branch that
    squares the adjacency for the variance."""
    f = ls.slot_pos.shape[0]
    if isinstance(inputs, tuple):
        mu, var = inputs
        mu_n = fanout_gather(mu, ls.slot_pos, ls.slot_w)
        var_n = fanout_gather(var, ls.slot_pos, jnp.square(ls.slot_w))
        if normalization == "gcn":
            return mu_n, var_n
        return (jnp.concatenate((mu[:f], mu_n), axis=1),
                jnp.concatenate((var[:f], var_n), axis=1))
    nbr = fanout_gather(inputs, ls.slot_pos, ls.slot_w)
    return _self_concat(normalization, inputs[:f], nbr)


def vr_aggregate(inputs, ls: LayerSample, field_in: jax.Array,
                 field_out: jax.Array, graph: PaddedGraph,
                 history: Tuple[jax.Array, ...], cvd: bool,
                 normalization: str, use_pallas: bool = False):
    """VRAggregator (gcn/layers.py:282-362).

    Returns (outputs, new_history) where new_history is a tuple of arrays
    defined on the INPUT field rows ([C_in, d]) to be scattered back at
    ``field_in`` after the optimizer step (gcn/models.py:160-166,186-191).

    Three branches, dispatched exactly like the reference:
      cvd         — dual-stream (h, mu) with per-node 1/sqrt scale
      (mu, var)   — det_dropout moment propagation with squared/cross adj
      plain       — CV: Â_samp·(H - h̄) + Â_full·h̄
    """
    f = ls.slot_pos.shape[0]

    if cvd:
        h, mu = inputs
        mu_small = jnp.take(history[0], field_in, axis=0)   # h̄ on in-field
        z = h - mu
        delta_mu = mu - mu_small
        mu_mean = full_neighborhood_mean(history[0], graph, field_out,
                                         use_pallas=use_pallas)
        mu_neighbour = fanout_gather(delta_mu, ls.slot_pos, ls.slot_w) \
            + mu_mean
        h_neighbour = fanout_gather(z, ls.slot_pos, ls.slot_w) \
            * ls.scales[:, None] + mu_neighbour
        new_history = (mu,)
        if normalization == "gcn":
            return (h_neighbour, mu_neighbour), new_history
        return ((jnp.concatenate((h[:f], h_neighbour), axis=1),
                 jnp.concatenate((mu[:f], mu_neighbour), axis=1)),
                new_history)

    if isinstance(inputs, tuple):
        # det_dropout: (mu, var) moments (gcn/layers.py:320-349)
        mu, var = inputs
        mu_history, var_history = history

        delta_mu = mu - jnp.take(mu_history, field_in, axis=0)
        sigma = jnp.sqrt(var)
        sigma_bar = jnp.sqrt(jnp.take(var_history, field_in, axis=0))
        delta_sigma = sigma - sigma_bar
        msigma = delta_sigma * sigma_bar

        mu_neighbour = fanout_gather(delta_mu, ls.slot_pos, ls.slot_w) \
            + full_neighborhood_mean(mu_history, graph, field_out,
                                     use_pallas=use_pallas)
        var_neighbour = (
            fanout_gather(jnp.square(delta_sigma), ls.slot_pos,
                          jnp.square(ls.slot_w))
            + full_neighborhood_mean(var_history, graph, field_out,
                                     square=True, use_pallas=use_pallas)
            + 2.0 * fanout_gather(msigma, ls.slot_pos, ls.slot_aw))
        var_neighbour = jax.nn.relu(var_neighbour) + 1e-10

        new_history = (mu, var)
        if normalization == "gcn":
            return (mu_neighbour, var_neighbour), new_history
        return ((jnp.concatenate((mu[:f], mu_neighbour), axis=1),
                 jnp.concatenate((var[:f], var_neighbour), axis=1)),
                new_history)

    # plain CV (gcn/layers.py:350-362):
    #   Z = Â_samp·(H - h̄[field_in]) + Â_full·h̄
    # (the reference computes Â·H - Â·h̄ as two SpMMs; fused here — same
    # linear algebra, half the gather traffic)
    hist = history[0]
    delta = inputs - jnp.take(hist, field_in, axis=0)
    a_neighbour = fanout_gather(delta, ls.slot_pos, ls.slot_w) \
        + full_neighborhood_mean(hist, graph, field_out,
                                 use_pallas=use_pallas)
    new_history = (inputs,)
    return _self_concat(normalization, inputs[:f], a_neighbour), new_history
