"""Measure per-chip collective payload of the sharded train step.

Lowers the data-parallel train step on the 8-device virtual CPU mesh and
sums the output bytes of every collective op (all-gather / all-reduce /
reduce-scatter / all-to-all / collective-permute) in the optimized HLO —
an upper bound on per-chip ICI bytes per step.  Run at two graph sizes to
show the owner-routed (halo) lowering's payload scales with the BATCH
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

from stochastic_gcn_tpu.config import Config  # noqa: E402
from stochastic_gcn_tpu.data.graph import (pad_features_rows,  # noqa: E402
                                           pad_graph_rows, pad_table_rows)
from stochastic_gcn_tpu.data.loaders import synthetic_dataset  # noqa: E402
from stochastic_gcn_tpu.parallel.mesh import (data_shardings,  # noqa: E402
                                              make_mesh,
                                              make_sharded_train_step,
                                              state_shardings)
from stochastic_gcn_tpu.training.loop import Trainer  # noqa: E402

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
               "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
               "pred": 1}
COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter", "all-to-all",
               "collective-permute")


def shape_bytes(shape_str: str) -> int:
    """Bytes of one 'f32[4,128]{...}'-style HLO shape; tuples summed."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str):
    """Sum of collective-op output bytes in optimized HLO, by op kind."""
    out = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"\S+ = (\(?[^)]*\)?) (\S+?)\(", s)
        if not m:
            continue
        op = m.group(2).split(".")[0]
        if op.endswith("-start"):
            op = op[:-6]
        if op in COLLECTIVES:
            out[op] = out.get(op, 0) + shape_bytes(m.group(1))
    return out


def lower_step(n_nodes: int, batch: int, n_dev: int, shard_graph: bool,
               halo: bool):
    ds = synthetic_dataset(num_nodes=n_nodes, feature_dim=64, num_classes=8,
                           avg_degree=8, seed=0, normalization="graphsage")
    cfg = Config(dataset="synthetic", batch_size=batch, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=64,
                 normalization="graphsage", layer_norm=True, dropout=0.2,
                 weight_decay=0.0, seed=1, halo_exchange=halo)
    tr = Trainer(cfg, ds)
    mesh = make_mesh(n_dev)
    if shard_graph:
        data = (pad_graph_rows(tr.graph_train, n_dev),
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
    print(f"devices={n_dev}  batch={batch}  (bytes = per-chip collective "
          "output bytes per step, upper bound)")
    for n_nodes in (4096, 16384):
        print(f"\n--- N={n_nodes} ---")
        for name, sg, halo in (("repl-data       ", False, True),
                               ("shard-data      ", True, True),
                               ("shard-data-gspmd", True, False)):
            txt = lower_step(n_nodes, batch, n_dev, sg, halo)
            per = collective_bytes(txt)
            tot = sum(per.values())
            detail = " ".join(f"{k}={v/1e6:.2f}MB" for k, v in
                              sorted(per.items()))
            print(f"  {name} total={tot/1e6:6.2f} MB/step   {detail}")


if __name__ == "__main__":
    main()
