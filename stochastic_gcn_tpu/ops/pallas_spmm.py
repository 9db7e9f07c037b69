"""Pallas TPU kernels for the hot aggregation ops.

Two fused gather-weight-accumulate kernels replace the gather + einsum
chains of models/aggregators.py (the TPU re-design of the reference's
``tf.sparse_tensor_dense_matmul`` SpMM path, gcn/layers.py:31-37):

* :func:`fanout_aggregate` — sampled-adjacency aggregation
  ``out[f] = sum_s w[f,s] * x[pos[f,s]]`` with the source activations held
  entirely in VMEM (the in-field activation matrix of a minibatch fits
  comfortably: <= a few MB).

* :func:`hbm_gather_aggregate` — the CV full-neighborhood term
  ``out[f] = sum_s w[f,s] * table[idx[f,s]]`` streaming rows of an
  HBM-resident table ([N+1, d] history) through a double-buffered DMA
  pipeline, accumulating in VMEM.  XLA's gather for this shape runs far
  below HBM bandwidth; the kernel keeps many row DMAs in flight.

Indices AND weights ride the scalar-prefetch path (SMEM): Mosaic cannot do
dynamic scalar loads from a VMEM tile's lane dimension ("index in dimension
1 is a multiple of 128" errors), but SMEM scalar reads are free-form.

Both have `interpret=True` paths used by the CPU test-suite; numerical
equality vs the jnp reference implementations is covered in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# fanout_aggregate: VMEM-resident gather-aggregate
# ---------------------------------------------------------------------------

def _fanout_kernel(pos_ref, w_ref, x_ref, o_ref, *, tf: int, k: int):
    i = pl.program_id(0)

    def row_body(r, _):
        base = (i * tf + r) * k

        def slot_body(s, acc):
            p = pos_ref[base + s]
            row = x_ref[pl.ds(p, 1), :]            # [1, d] VMEM read
            return acc + w_ref[base + s] * row

        acc0 = jnp.zeros((1, x_ref.shape[1]), jnp.float32)
        acc = jax.lax.fori_loop(0, k, slot_body, acc0)
        o_ref[pl.ds(r, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, tf, row_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def fanout_aggregate(x: jax.Array, pos: jax.Array, w: jax.Array,
                     interpret: bool = False, tile: int = 8) -> jax.Array:
    """out[f] = sum_s w[f, s] * x[pos[f, s]]  — x fully VMEM-resident.

    x: [C, d] float32; pos: [F, K] int32 in [0, C); w: [F, K] float32.
    """
    f, k = pos.shape
    d = x.shape[1]
    tf = min(tile, f)
    f_pad = _round_up(f, tf)
    if f_pad != f:
        pos = jnp.pad(pos, ((0, f_pad - f), (0, 0)))
        w = jnp.pad(w, ((0, f_pad - f), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                      # pos, w in SMEM
        grid=(f_pad // tf,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x (whole array)
        ],
        out_specs=pl.BlockSpec((tf, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_fanout_kernel, tf=tf, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_pad, d), jnp.float32),
        interpret=interpret,
    )(pos.reshape(-1), w.reshape(-1), x)
    return out[:f]


# ---------------------------------------------------------------------------
# hbm_gather_aggregate: streaming gather-aggregate over an HBM table
# ---------------------------------------------------------------------------

_NBUF = 16  # DMA pipeline depth


def _hbm_kernel(idx_ref, w_ref, table_ref, o_ref, scratch, sems, *,
                tf: int, k: int):
    i = pl.program_id(0)
    total = tf * k

    def get_dma(j):
        slot = j % _NBUF
        p = idx_ref[i * total + j]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(p, 1), :],
            scratch.at[slot],
            sems.at[slot],
        )

    def warm(j, _):
        @pl.when(j < total)
        def _():
            get_dma(j).start()
        return 0

    jax.lax.fori_loop(0, _NBUF, warm, 0)

    def row_body(r, _):
        def slot_body(s, acc):
            j = r * k + s
            get_dma(j).wait()
            acc = acc + w_ref[i * total + j] * scratch[j % _NBUF]

            # refill this slot only AFTER consuming it (j+NBUF maps to the
            # same scratch slot as j)
            @pl.when(j + _NBUF < total)
            def _():
                get_dma(j + _NBUF).start()

            return acc

        acc0 = jnp.zeros((1, o_ref.shape[1]), jnp.float32)
        acc = jax.lax.fori_loop(0, k, slot_body, acc0)
        o_ref[pl.ds(r, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, tf, row_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def hbm_gather_aggregate(table: jax.Array, idx: jax.Array, w: jax.Array,
                         interpret: bool = False, tile: int = 8
                         ) -> jax.Array:
    """out[f] = sum_s w[f, s] * table[idx[f, s]] with table in HBM.

    table: [N, d] float32; idx: [F, K] int32 in [0, N); w: [F, K] float32
    (weight 0 slots may point anywhere valid).
    """
    f, k = idx.shape
    d = table.shape[1]
    tf = min(tile, f)
    f_pad = _round_up(f, tf)
    if f_pad != f:
        idx = jnp.pad(idx, ((0, f_pad - f), (0, 0)))
        w = jnp.pad(w, ((0, f_pad - f), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                      # idx, w in SMEM
        grid=(f_pad // tf,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # table stays in HBM
        ],
        out_specs=pl.BlockSpec((tf, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, 1, d), jnp.float32),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_hbm_kernel, tf=tf, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_pad, d), jnp.float32),
        interpret=interpret,
    )(idx.reshape(-1), w.reshape(-1), table)
    return out[:f]


# ---------------------------------------------------------------------------
# reference implementations (the XLA paths these kernels replace)
# ---------------------------------------------------------------------------

def fanout_aggregate_xla(x, pos, w):
    return jnp.einsum("fk,fkd->fd", w, jnp.take(x, pos, axis=0))


def hbm_gather_aggregate_xla(table, idx, w):
    return jnp.einsum("fk,fkd->fd", w, jnp.take(table, idx, axis=0))
