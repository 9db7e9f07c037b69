"""Measure what partition-aware batching saves (ROADMAP item 7).

On the 8-device virtual CPU mesh, compares the sharded train step's
per-chip collective payload (optimized-HLO output bytes of collective ops,
scripts/measure_halo_payload.py method) and the history-scatter drop count
across layouts:

  baseline           shuffled batches, classic field layout, cap_mult 2.0
  owner cap=2.0      owner-grouped batches + owner-aligned fields
  owner cap=0.25     same, scatter capacity cut 8x (safe because ~97% of
                     update rows are applied via the scatter's self-bypass
                     and never ride the all_to_all)

Also reports measured field self-locality (fraction of field rows whose
positional holder chip == owner chip) and end-of-epoch hist_dropped.

Usage: python scripts/measure_owner_batching.py
"""
import os
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

from measure_halo_payload import collective_bytes  # noqa: E402
from stochastic_gcn_tpu.config import Config  # noqa: E402
from stochastic_gcn_tpu.data.loaders import synthetic_dataset  # noqa: E402
from stochastic_gcn_tpu.parallel.mesh import shard_rows  # noqa: E402
from stochastic_gcn_tpu.sampler.scheduler import schedule  # noqa: E402
from stochastic_gcn_tpu.training.loop import Trainer  # noqa: E402

N, P, BATCH = 16384, 8, 256


def build(owner: bool, cap_mult: float, partition: str = "none"):
    ds = synthetic_dataset(num_nodes=N, feature_dim=64, num_classes=8,
                           avg_degree=8, seed=0, normalization="graphsage")
    cfg = Config(dataset="synthetic", batch_size=BATCH, test_batch_size=BATCH,
                 degree=1, test_degree=1, cv=True, test_cv=True, hidden1=64,
                 normalization="graphsage", layer_norm=True, dropout=0.2,
                 weight_decay=0.0, seed=1, dp=P, owner_batching=owner,
                 scatter_cap_mult=cap_mult, partition_nodes=partition)
    return Trainer(cfg, ds)


def locality(tr):
    """Self-locality of each field of one scheduled batch."""
    bm = tr._epoch_matrix(tr.train_iter.data, tr.cfg.batch_size)
    ob = P if tr.cfg.owner_batching else 0
    pack = schedule(jax.random.PRNGKey(0), tr.graph_train,
                    jnp.asarray(bm[0]), tr.train_degrees, cv=True,
                    round_multiple=P, owner_blocks=ob)
    n_loc = shard_rows(tr.ds.num_data, P) // P
    out = []
    for f in pack.fields:
        f = np.asarray(f)
        chunk = len(f) // P
        holder = np.minimum(np.arange(len(f)) // chunk, P - 1)
        owner_of = np.minimum(f // n_loc, P - 1)
        real = f < tr.ds.num_data
        out.append(float(((holder == owner_of) & real).sum()
                         / max(real.sum(), 1)))
    return out


def payload_and_drops(tr):
    bm = tr._epoch_matrix(tr.train_iter.data, tr.cfg.batch_size)[:4]
    lowered = tr._train_epoch.lower(
        tr.state, tr.graph_train, tr.train_features, tr.labels,
        tr.importance_train, jnp.asarray(bm), jax.random.PRNGKey(0))
    per = collective_bytes(lowered.compile().as_text())
    state, metrics = tr._train_epoch(
        tr.state, tr.graph_train, tr.train_features, tr.labels,
        tr.importance_train, jnp.asarray(bm), jax.random.PRNGKey(0))
    tr.state = state
    return per, int(metrics["hist_dropped"]), float(metrics["loss"])


def main():
    print(f"N={N} P={P} batch={BATCH} (bytes = per-chip collective output "
          "bytes per STEP; epoch of 4 steps lowered, bytes/4)")
    rows = [("baseline (shuffled, classic)", False, 2.0, "none"),
            ("owner-batching cap=2.0     ", True, 2.0, "none"),
            ("owner-batching cap=0.25    ", True, 0.25, "none")]
    for name, owner, cap, part in rows:
        tr = build(owner, cap, part)
        loc = locality(tr)
        per, dropped, loss = payload_and_drops(tr)
        tot = sum(per.values()) / 4
        detail = " ".join(f"{k}={v/4e6:.2f}MB" for k, v in sorted(per.items()))
        print(f"  {name} total={tot/1e6:6.2f} MB/step  dropped={dropped}"
              f"  loss={loss:.3f}")
        print(f"      locality={['%.3f' % x for x in loc]}  {detail}")


if __name__ == "__main__":
    main()
