"""IS (importance sampling) step cost at Reddit scale (VERDICT r1 #8).

The IS scheduler (sampler/scheduler.py::expand_importance) builds an
[N+1] union mask and runs top_k over the whole node set per layer per
step — fine at toy N, suspect at N=233k.  This measures NS+PP vs IS+PP
epoch-scan step time on the bench graph at batch 512 and 4096, plus a
scheduler-only ablation for IS.

Run on the TPU: nohup python scripts/profile_importance.py > log 2>&1 &
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_reddit_like, HIDDEN, PAD_DEG
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bm(ds, batch, s, seed):
    r = np.random.default_rng(seed)
    ids = np.resize(r.permutation(ds.train_d).astype(np.int32), s * batch)
    return jnp.asarray(ids.reshape(s, batch))


def epoch_ms(tr, ds, batch, steps):
    tr.state, m = tr._train_epoch(tr.state, tr.graph_train,
                                  tr.train_features, tr.labels,
                                  tr.importance_train, bm(ds, batch, steps, 1),
                                  tr._next_key())
    _ = float(m["loss"])
    t0 = time.time()
    tr.state, m = tr._train_epoch(tr.state, tr.graph_train,
                                  tr.train_features, tr.labels,
                                  tr.importance_train, bm(ds, batch, steps, 2),
                                  tr._next_key())
    _ = float(m["loss"])
    return (time.time() - t0) / steps * 1e3


def main():
    ds = build_reddit_like()
    log(f"devices={jax.devices()}")
    for batch, steps in ((512, 200), (4096, 60)):
        for name, over in (("NS+PP", dict()),
                           ("IS+PP approx", dict(importance=True)),
                           ("IS+PP exact",
                            dict(importance=True, is_approx_topk=False))):
            cfg = Config(dataset="reddit_like", batch_size=batch, degree=1,
                         test_degree=1, cv=False, test_cv=False,
                         hidden1=HIDDEN, normalization="graphsage",
                         layer_norm=True, num_fc_layers=2,
                         weight_decay=0.0, dropout=0.2,
                         pad_degree=PAD_DEG, seed=1, **over)
            tr = Trainer(cfg, ds)
            ms = epoch_ms(tr, ds, batch, steps)
            log(f"  batch={batch:<5d} {name:7s} {ms:7.3f} ms/step")
            del tr


if __name__ == "__main__":
    main()
