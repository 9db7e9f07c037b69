"""Data-parallel scaling harness: edges/s at dp = 1, 2, 4, ... devices.

On real multi-chip hardware this measures the BASELINE.md scaling-efficiency
target (>= 80% at >= 2 hosts). On the virtual CPU mesh it validates the
sharded pipeline end-to-end (wall-clock numbers are not meaningful there).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--batch_per_device", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--hidden", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from stochastic_gcn_tpu.config import Config
    from stochastic_gcn_tpu.data.loaders import synthetic_dataset
    from stochastic_gcn_tpu.training.loop import Trainer

    n_dev = len(jax.devices())
    ds = synthetic_dataset(num_nodes=args.nodes, feature_dim=64,
                           num_classes=8, avg_degree=16, seed=0,
                           normalization="graphsage")
    results = []
    dp = 1
    while dp <= n_dev:
        cfg = Config(dataset="synthetic", batch_size=args.batch_per_device
                     * dp, degree=1, test_degree=1, cv=True, test_cv=True,
                     hidden1=args.hidden, normalization="graphsage",
                     layer_norm=True, dropout=0.2, weight_decay=0.0,
                     seed=1, dp=dp)
        tr = Trainer(cfg, ds)
        rng = np.random.default_rng(0)
        ids = np.resize(rng.permutation(ds.train_d).astype(np.int32),
                        args.steps * cfg.batch_size)
        bm = jnp.asarray(ids.reshape(args.steps, cfg.batch_size))
        tr.state, m = tr._train_epoch(tr.state, tr.graph_train,
                                      tr.train_features, tr.labels,
                                      tr.importance_train, bm,
                                      tr._next_key())
        _ = float(m["loss"])
        t0 = time.time()
        tr.state, m = tr._train_epoch(tr.state, tr.graph_train,
                                      tr.train_features, tr.labels,
                                      tr.importance_train, bm,
                                      tr._next_key())
        amt = int(m["amt_data"])
        dt = time.time() - t0
        eps = amt / dt
        results.append(dict(dp=dp, edges_per_s=round(eps, 1),
                            step_ms=round(1000 * dt / args.steps, 2)))
        dp *= 2

    base = results[0]["edges_per_s"]
    for r in results:
        r["scaling_efficiency"] = round(
            r["edges_per_s"] / (base * r["dp"]), 3)
    print(json.dumps(dict(device=str(jax.devices()[0]),
                          results=results)))


if __name__ == "__main__":
    main()
