"""Round-5 residual re-measurement with the corrected timing protocol
(null-RTT subtraction + pre-staged batches — bench.py::measure_epochs).

Motivation: every earlier per-dispatch number (roofline decomposition,
schedule-only ablations, the lazy/tier A/Bs) closed its timing window
with a value fetch whose ~25 ms tunnel transit was INSIDE the window —
at batch 512 with 200-300-step dispatches that is 0.08-0.125 ms/step of
apparatus, i.e. 15-45%% of the quantities under study.  This script
re-derives the single-chip decomposition (VERDICT r4 weak #3 / task #7)
and characterizes the 3-layer path (task #2) under one protocol:

* full train step: L2/L3 x batch 512/4096 x {default, --fadj_tier off,
  --nofield_dedup, f32 history, sched_prepass off}
* schedule-only: production vs no-dedup at both batches (L2 and L3)

Emits one JSON line; PERF.md "Round 5" records the findings.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_reddit_like, HIDDEN, PAD_DEG
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_cfg(batch, **over):
    base = dict(dataset="reddit_like", batch_size=batch, degree=1,
                test_degree=1, cv=True, test_cv=True, hidden1=HIDDEN,
                normalization="graphsage", layer_norm=True,
                num_fc_layers=2, weight_decay=0.0, dropout=0.2,
                pad_degree=PAD_DEG, seed=1)
    base.update(over)
    return Config(**base)


def step_ms(tr, ds, batch, steps, reps=3):
    """Median RTT-corrected per-step ms over ``reps`` dispatches."""
    rng = np.random.default_rng(0)
    bms = []
    for _ in range(reps + 1):
        ids = np.resize(rng.permutation(ds.train_d).astype(np.int32),
                        steps * batch)
        bms.append(jnp.asarray(ids.reshape(steps, batch)))
    _ = int(bms[-1][0, 0])
    tr.state, m = tr._train_epoch(tr.state, tr.graph_train,
                                  tr.train_features, tr.labels,
                                  tr.importance_train, bms[-1],
                                  tr._next_key())
    _ = float(m["loss"])
    dts = []
    for r in range(reps):
        r0 = time.time()
        _ = int(tr.state.step)
        rtt = time.time() - r0
        t0 = time.time()
        tr.state, m = tr._train_epoch(tr.state, tr.graph_train,
                                      tr.train_features, tr.labels,
                                      tr.importance_train, bms[r],
                                      tr._next_key())
        _ = int(m["amt_data"])
        dts.append(max(time.time() - t0 - rtt, 1e-9))
    return float(np.median(dts)) / steps * 1e3


def sched_ms(graph, ids, degrees, steps, dedup=True, reps=3):
    """Schedule-only scan, RTT-corrected."""
    from stochastic_gcn_tpu.sampler import scheduler as S

    @jax.jit
    def run(ids):
        def body(c, i):
            pack = S.schedule(jax.random.fold_in(jax.random.PRNGKey(0), i),
                              graph, ids, degrees, cv=True, dedup=dedup)
            leaves = jax.tree_util.tree_leaves(pack)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(steps))
        return c

    _ = float(run(ids))
    dts = []
    for _ in range(reps):
        r0 = time.time()
        _ = int(ids[0])
        rtt = time.time() - r0
        t0 = time.time()
        _ = float(run(ids))
        dts.append(max(time.time() - t0 - rtt, 1e-9))
    return float(np.median(dts)) / steps * 1e3


def main():
    log(f"devices={jax.devices()}")
    ds = build_reddit_like()
    out = {}

    VARIANTS = [
        ("default", dict()),
        ("tier_off", dict(fadj_tier=False)),
        ("nodedup_off", dict(field_dedup=True)),   # default is no-dedup
        ("f32_hist", dict(history_dtype="float32")),
        ("prepass_off", dict(sched_prepass="off")),
    ]
    for L in (2, 3):
        for batch, steps in ((512, 300), (4096, 100)):
            for name, over in VARIANTS:
                if name != "default" and (L, batch) not in ((3, 512),
                                                            (3, 4096)):
                    continue     # levers re-checked at the L=3 shapes
                tr = Trainer(make_cfg(batch, num_layers=L, **over), ds)
                ms = step_ms(tr, ds, batch, steps)
                key = f"L{L}_b{batch}_{name}_ms"
                out[key] = round(ms, 4)
                log(f"{key} = {ms:.4f}")
                del tr
                print(json.dumps(out), flush=True)

    # schedule-only decomposition at L2/L3
    from stochastic_gcn_tpu.data.graph import pad_csr
    g = pad_csr(ds.train_adj, PAD_DEG)
    rng = np.random.default_rng(0)
    for L in (2, 3):
        degrees = (1,) * (L - 1)   # PP removes one sampled layer
        for batch, steps in ((512, 300), (4096, 100)):
            ids = jnp.asarray(rng.choice(ds.train_d, size=batch,
                                         replace=False).astype(np.int32))
            for dedup, nm in ((False, "nodedup"), (True, "dedup")):
                ms = sched_ms(g, ids, degrees, steps, dedup=dedup)
                key = f"sched_L{L}_b{batch}_{nm}_ms"
                out[key] = round(ms, 4)
                log(f"{key} = {ms:.4f}")
            print(json.dumps(out), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
