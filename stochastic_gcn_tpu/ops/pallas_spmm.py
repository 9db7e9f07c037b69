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
  HBM-resident table ([N+1, d] history) through a pipelined DMA ring,
  accumulating in VMEM.

Index/weight handling: Mosaic can neither do dynamic scalar loads from a
VMEM tile's lane dimension nor hold [F, Dcap]-sized arrays in SMEM via
scalar prefetch (SMEM budget).  So idx/w stay in HBM/ANY and each grid step
DMAs its OWN tile into SMEM scratch before the gather loop — the canonical
pattern for data-dependent addressing at scale.

Measured on TPU v5e (scripts/bench_kernels.py): the HBM streaming kernel
is ~3x slower than XLA's native gather+einsum (row-DMA issue overhead vs
the hardware gather path) but ~5000x MORE ACCURATE — XLA's default-
precision einsum reduces in bf16 passes (6.4e-2 abs err vs f64 truth at
Dcap=128) while the kernel accumulates in true f32 (1.2e-5).  The model
keeps the fast XLA path by default (the CV estimator tolerates the noise —
history is a control variate, any h̄ keeps it unbiased); the kernel is the
full-precision option and the base for the fused-CV work in ROADMAP.md.

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


_ALIGN = 1024  # 1-D HBM arrays are tiled at 1024 elements; DMA slices must
               # start and size on this boundary


def _load_tile_to_smem(src_ref, smem_ref, sem, tile_start, size):
    """DMA a [size] slice of a 1-D HBM array into SMEM scratch.
    ``tile_start`` and ``size`` must be _ALIGN-aligned."""
    cp = pltpu.make_async_copy(
        src_ref.at[pl.ds(tile_start, size)], smem_ref, sem)
    cp.start()
    cp.wait()


def _tile_flatten(a2d, n_tiles: int, total: int):
    """[F, K]-shaped per-tile data -> flat array where tile i occupies
    [i*total_pad, i*total_pad + total) with _ALIGN-aligned stride."""
    total_pad = _round_up(total, _ALIGN)
    a = a2d.reshape(n_tiles, total)
    if total_pad != total:
        a = jnp.pad(a, ((0, 0), (0, total_pad - total)))
    return a.reshape(-1), total_pad


# ---------------------------------------------------------------------------
# fanout_aggregate: VMEM-resident gather-aggregate
# ---------------------------------------------------------------------------

def _fanout_kernel(pos_hbm, w_hbm, x_ref, o_ref, pos_s, w_s, sems, *,
                   tf: int, k: int, total_pad: int):
    i = pl.program_id(0)
    _load_tile_to_smem(pos_hbm, pos_s, sems.at[0], i * total_pad, total_pad)
    _load_tile_to_smem(w_hbm, w_s, sems.at[1], i * total_pad, total_pad)

    def row_body(r, _):
        def slot_body(s, acc):
            j = r * k + s
            p = pos_s[j]
            row = x_ref[pl.ds(p, 1), :]            # [1, d] VMEM read
            return acc + w_s[j] * row

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
    total = tf * k
    n_tiles = f_pad // tf
    pos_flat, total_pad = _tile_flatten(pos, n_tiles, total)
    w_flat, _ = _tile_flatten(w, n_tiles, total)

    out = pl.pallas_call(
        functools.partial(_fanout_kernel, tf=tf, k=k, total_pad=total_pad),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # pos (flat, in HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # w (flat, in HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x (whole array)
        ],
        out_specs=pl.BlockSpec((tf, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, d), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((total_pad,), jnp.int32),
            pltpu.SMEM((total_pad,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pos_flat, w_flat, x)
    return out[:f]


# ---------------------------------------------------------------------------
# hbm_gather_aggregate: streaming gather-aggregate over an HBM table
# ---------------------------------------------------------------------------

_NBUF = 16  # DMA ring depth


def _hbm_kernel(idx_hbm, w_hbm, table_ref, o_ref, idx_s, w_s, io_sems,
                scratch, sems, *, tf: int, k: int, total_pad: int):
    i = pl.program_id(0)
    total = tf * k
    _load_tile_to_smem(idx_hbm, idx_s, io_sems.at[0], i * total_pad,
                       total_pad)
    _load_tile_to_smem(w_hbm, w_s, io_sems.at[1], i * total_pad, total_pad)

    def get_dma(j):
        slot = j % _NBUF
        p = idx_s[j]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(p, 1), :],
            scratch.at[slot],
            sems.at[slot],
        )

    # NBUF-1 DMAs in flight: the refill for j+NBUF-1 lands in the slot
    # consumed one iteration earlier ((j-1) % NBUF) — defensive slack
    # between the VMEM read of a slot and the DMA that overwrites it.
    def warm(j, _):
        @pl.when(j < total)
        def _():
            get_dma(j).start()
        return 0

    jax.lax.fori_loop(0, _NBUF - 1, warm, 0)

    def row_body(r, _):
        def slot_body(s, acc):
            j = r * k + s
            get_dma(j).wait()
            acc = acc + w_s[j] * scratch[j % _NBUF]

            @pl.when(j + _NBUF - 1 < total)
            def _():
                get_dma(j + _NBUF - 1).start()

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
    total = tf * k
    n_tiles = f_pad // tf
    idx_flat, total_pad = _tile_flatten(idx, n_tiles, total)
    w_flat, _ = _tile_flatten(w, n_tiles, total)

    out = pl.pallas_call(
        functools.partial(_hbm_kernel, tf=tf, k=k, total_pad=total_pad),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # idx (flat, in HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # w (flat, in HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # table stays in HBM
        ],
        out_specs=pl.BlockSpec((tf, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_pad, d), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((total_pad,), jnp.int32),
            pltpu.SMEM((total_pad,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((_NBUF, 1, d), jnp.float32),
            pltpu.SemaphoreType.DMA((_NBUF,)),
        ],
        interpret=interpret,
    )(idx_flat, w_flat, table)
    return out[:f]


# ---------------------------------------------------------------------------
# reference implementations (the XLA paths these kernels replace)
# ---------------------------------------------------------------------------

def fanout_aggregate_xla(x, pos, w):
    return jnp.einsum("fk,fkd->fd", w, jnp.take(x, pos, axis=0))


def hbm_gather_aggregate_xla(table, idx, w):
    return jnp.einsum("fk,fkd->fd", w, jnp.take(table, idx, axis=0))
