"""Device-mesh utilities and sharded training-step construction.

The reference has NO multi-device support of any kind (single tf.Session,
single GPU — SURVEY.md §2.3).  This module is the scale-out layer the TPU
design adds: a 1-D ``('data',)`` mesh where the minibatch (and hence each
layer's receptive field work) is sharded across chips, parameters/graph/
history are replicated, and XLA's SPMD partitioner inserts the gradient
all-reduce and the history-update all-gathers over ICI.

Later rounds extend this with node-dimension sharding of the [N, d] history
(halo exchange via ragged all-to-all), per SURVEY.md §5.8.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def make_sharded_train_step(cfg, spec, degrees: Tuple[int, ...],
                            num_nodes: int, mesh: Mesh):
    """Data-parallel version of :func:`training.step.make_train_step`.

    Sharding layout:
      state (params/opt/history) — replicated; the functional history scatter
        from the sharded batch becomes an XLA all-gather + identical update
        on every chip, keeping replicas bit-identical.
      graph/features/labels/importance — replicated (round-1 layout; the
        [N, d] history/feature shard-by-node layout lands with halo exchange).
      batch_ids — sharded along the 'data' axis.
    """
    from ..training.step import build_train_step

    repl = replicated(mesh)
    shard = batch_sharded(mesh)
    inner = build_train_step(cfg, spec, degrees, num_nodes)

    return jax.jit(
        inner,
        in_shardings=(repl, repl, repl, repl, repl, shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def pad_batch_for_mesh(batch: np.ndarray, n_devices: int,
                       num_nodes: int) -> np.ndarray:
    """Pad a batch so its length divides the mesh size (sentinel padding)."""
    rem = len(batch) % n_devices
    if rem == 0:
        return batch
    pad = np.full(n_devices - rem, num_nodes, np.int32)
    return np.concatenate([np.asarray(batch, np.int32), pad])
