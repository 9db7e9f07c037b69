"""Measure per-chip collective payload of the sharded train step.

Lowers the data-parallel train step on the 8-device virtual CPU mesh and
models the per-chip WIRE bytes of every collective op in the optimized
HLO (ring model: all-gather/all-to-all/permute ~ (P-1)/P x result,
all-reduce ~ 2(P-1)/P x operand, reduce-scatter ~ (P-1) x result — the
result-bytes metric used before round 2 under-counted reduce-scatter by
P-1x and double-counted untaken lax.cond branches).  Conditionals
contribute their CHEAPEST branch: for the fetch-routed gathers
(halo.py::_fetch_or_psum_gather) that is the no-overflow fetch path,
which is the steady-state path (the psum fallback only triggers on
capacity overflow, which the default capacity makes a never-event for
shuffled or owner-aligned batches).  Run at two graph sizes to show the
owner-routed (halo) lowering's payload scales with the BATCH
(receptive-field size), not with N, unlike GSPMD's default all-gather of
whole [N, ...] tables.

Layouts compared (all with node-sharded history):
  repl-data          graph/features/labels replicated (round-1 layout)
  shard-data         every O(N) table node-sharded, halo-routed accesses
  shard-data-gspmd   same sharding, halo_exchange=False (GSPMD lowering)

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
       scripts/measure_halo_payload.py
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from stochastic_gcn_tpu.parallel.payload import (  # noqa: E402,F401
    COLLECTIVES, DTYPE_BYTES, collective_bytes, shape_bytes)
from stochastic_gcn_tpu.config import Config  # noqa: E402
from stochastic_gcn_tpu.data.graph import (pad_features_rows,  # noqa: E402
                                           pad_graph_rows, pad_table_rows)
from stochastic_gcn_tpu.data.loaders import synthetic_dataset  # noqa: E402
from stochastic_gcn_tpu.parallel.mesh import (data_shardings,  # noqa: E402
                                              make_mesh,
                                              make_sharded_train_step,
                                              state_shardings)
from stochastic_gcn_tpu.training.loop import Trainer  # noqa: E402

def lower_step(n_nodes: int, batch: int, n_dev: int, shard_graph: bool,
               halo: bool, fetch: bool = True, owner: bool = False,
               tp: int = 1, graph_format: str = "padded"):
    from stochastic_gcn_tpu.parallel import halo as H
    H.FETCH_GATHER = fetch
    return _lower_step(n_nodes, batch, n_dev, shard_graph, halo, owner, tp,
                       graph_format)


def _lower_step(n_nodes: int, batch: int, n_dev: int, shard_graph: bool,
                halo: bool, owner: bool = False, tp: int = 1,
                graph_format: str = "padded"):
    from stochastic_gcn_tpu.data.graph import FlatGraph
    ds = synthetic_dataset(num_nodes=n_nodes, feature_dim=64, num_classes=8,
                           avg_degree=8, seed=0, normalization="graphsage")
    dp = n_dev // tp
    cfg = Config(dataset="synthetic", batch_size=batch, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=64,
                 normalization="graphsage", layer_norm=True, dropout=0.2,
                 weight_decay=0.0, seed=1, halo_exchange=halo,
                 owner_batching=owner, tp=tp, graph_format=graph_format,
                 fadj_edge_mult=8.0,
                 dp=dp if (owner or tp > 1 or graph_format == "edgelist")
                 else 0)
    tr = Trainer(cfg, ds)
    n_dev = dp
    mesh = make_mesh(dp, tp=tp)
    if shard_graph and not isinstance(tr.graph_train, FlatGraph):
        data = (pad_graph_rows(tr.graph_train, n_dev),
                pad_features_rows(tr.train_features, n_dev),
                pad_table_rows(tr.labels, n_dev))
    elif shard_graph:
        # the Trainer built flat_csr(parts=dp) already (cfg.dp set above)
        data = (tr.graph_train,
                pad_features_rows(tr.train_features, n_dev),
                pad_table_rows(tr.labels, n_dev))
    else:
        data = (tr.graph_train, tr.train_features, tr.labels)
    step = make_sharded_train_step(cfg, tr.train_spec, tr.train_degrees,
                                   ds.num_data, mesh,
                                   state_template=tr.state,
                                   shard_history=True,
                                   data_template=data,
                                   shard_graph=shard_graph)
    batch_ids = jnp.asarray(
        np.asarray(ds.train_d[:batch], np.int32))
    state = jax.device_put(tr.state, state_shardings(mesh, tr.state, True))
    data = jax.device_put(data, data_shardings(mesh, data, shard_graph))
    lowered = step.lower(state, *data, tr.importance_train,
                         jax.device_put(batch_ids,
                                        NamedSharding(mesh, P("data"))),
                         jax.random.PRNGKey(0))
    return lowered.compile().as_text()


def main():
    n_dev = len(jax.devices())
    batch = 256
    print(f"devices={n_dev}  batch={batch}  (bytes = modeled per-chip WIRE "
          "bytes per step, executed path)")
    for n_nodes in (4096, 16384):
        print(f"\n--- N={n_nodes} ---")
        for name, sg, halo, fetch, owner, tp in (
                ("repl-data       ", False, True, True, False, 1),
                ("shard-data      ", True, True, True, False, 1),
                ("shard-data-owner", True, True, True, True, 1),
                ("shard-data-tp2  ", True, True, True, False, 2),
                ("shard-data-psum ", True, True, False, False, 1),
                ("shard-data-gspmd", True, False, True, False, 1)):
            txt = lower_step(n_nodes, batch, n_dev, sg, halo, fetch, owner,
                             tp)
            per = collective_bytes(txt, n_dev)
            tot = sum(per.values())
            detail = " ".join(f"{k}={v/1e6:.2f}MB" for k, v in
                              sorted(per.items()))
            print(f"  {name} total={tot/1e6:6.2f} MB/step   {detail}")


if __name__ == "__main__":
    main()
