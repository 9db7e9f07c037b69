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


def _parse_computations(hlo_text: str):
    """Split optimized HLO into {computation_name: [op lines]} and find the
    entry computation name."""
    comps, entry, cur = {}, None, None
    for line in hlo_text.splitlines():
        m = re.match(r"(ENTRY )?%?([\w.\-]+) (?:\([^)]*\) -> |\().*\{", line)
        if m and not line.startswith(" "):
            cur = m.group(2)
            comps[cur] = []
            if m.group(1):
                entry = cur
            continue
        if cur is not None and line.startswith("}"):
            cur = None
            continue
        if cur is not None:
            comps[cur].append(line.strip())
    return comps, entry


_CALLEE_RE = re.compile(
    r"(?:to_apply|body|condition|true_computation|false_computation)="
    r"%?([\w.\-]+)|branch_computations=\{([^}]*)\}|"
    r"called_computations=\{([^}]*)\}")


def _op_callees(line: str):
    names = []
    for m in _CALLEE_RE.finditer(line):
        if m.group(1):
            names.append(m.group(1))
        else:
            names += [s.strip().lstrip("%") for s in
                      (m.group(2) or m.group(3)).split(",") if s.strip()]
    return names


def collective_bytes(hlo_text: str, p: int):
    """Per-chip WIRE bytes of the executed path, by collective kind.

    Ring model per op (result = output shape bytes):
      all-gather / all-to-all / collective-permute: (p-1)/p x result
      all-reduce: 2(p-1)/p x result;  reduce-scatter: (p-1) x result
    Conditionals contribute their cheapest branch (the steady-state
    no-overflow fetch path); while bodies are counted once."""
    comps, entry = _parse_computations(hlo_text)

    def group_size(line):
        """Replica-group size of a collective (ring factor base); falls
        back to the full mesh.  Handles both the iota form
        ``replica_groups=[4,2]<=[8]`` (4 groups of 2) and the literal form
        ``replica_groups={{0,1,2,3},{...}}``."""
        m = re.search(r"replica_groups=\[(\d+),(\d+)\]", line)
        if m:
            return max(1, int(m.group(2)))
        m = re.search(r"replica_groups=\{\{([^}]*)\}", line)
        if m and m.group(1).strip():
            return len(m.group(1).split(","))
        return p

    def op_bytes(line):
        m = re.match(r"\S+ = (\(?[^)]*\)?) (\S+?)\(", line)
        if not m:
            return {}
        op = m.group(2).split(".")[0]
        if op.endswith("-start"):
            op = op[:-6]
        if op not in COLLECTIVES:
            return {}
        b = shape_bytes(m.group(1))
        g = group_size(line)
        if g <= 1:
            return {}
        if op == "all-reduce":
            b = 2 * b * (g - 1) // g
        elif op == "reduce-scatter":
            b = b * (g - 1)
        else:
            b = b * (g - 1) // g
        return {op: b}

    memo = {}

    def walk(name):
        if name in memo:
            return memo[name]
        memo[name] = {}          # cycle guard
        total = {}
        for line in comps.get(name, ()):
            for k, v in op_bytes(line).items():
                total[k] = total.get(k, 0) + v
            callees = _op_callees(line)
            if not callees:
                continue
            subs = [walk(c) for c in callees if c in comps]
            if "conditional" in line and subs:
                subs = [min(subs, key=lambda s: sum(s.values()))]
            for s in subs:
                for k, v in s.items():
                    total[k] = total.get(k, 0) + v
        memo[name] = total
        return total

    return walk(entry)


def lower_step(n_nodes: int, batch: int, n_dev: int, shard_graph: bool,
               halo: bool, fetch: bool = True, owner: bool = False,
               tp: int = 1):
    from stochastic_gcn_tpu.parallel import halo as H
    H.FETCH_GATHER = fetch
    return _lower_step(n_nodes, batch, n_dev, shard_graph, halo, owner, tp)


def _lower_step(n_nodes: int, batch: int, n_dev: int, shard_graph: bool,
                halo: bool, owner: bool = False, tp: int = 1):
    ds = synthetic_dataset(num_nodes=n_nodes, feature_dim=64, num_classes=8,
                           avg_degree=8, seed=0, normalization="graphsage")
    dp = n_dev // tp
    cfg = Config(dataset="synthetic", batch_size=batch, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=64,
                 normalization="graphsage", layer_norm=True, dropout=0.2,
                 weight_decay=0.0, seed=1, halo_exchange=halo,
                 owner_batching=owner, tp=tp,
                 dp=dp if (owner or tp > 1) else 0)
    tr = Trainer(cfg, ds)
    n_dev = dp
    mesh = make_mesh(dp, tp=tp)
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
