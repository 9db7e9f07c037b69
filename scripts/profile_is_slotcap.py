"""Same-process A/B of the IS slot cap (--is_slot_cap) against NS+PP on
the headline bench graph: the cap shrinks the model-side fanout gather
from F*Dcap to F*cap activation row-issues (the dominant IS cost at
scale, PERF.md 'IS at Reddit scale').  Also reports dropped edges."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax.numpy as jnp

from bench import build_reddit_like, HIDDEN, PAD_DEG
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bm(ds, batch, s, seed2):
    r = np.random.default_rng(seed2)
    ids = np.resize(r.permutation(ds.train_d).astype(np.int32), s * batch)
    return jnp.asarray(ids.reshape(s, batch))


def run(tr, ds, batch, steps, reps=3):
    st, m = tr._train_epoch(tr.state, tr.graph_train, tr.train_features,
                            tr.labels, tr.importance_train,
                            bm(ds, batch, steps, 1), tr._next_key())
    _ = float(m["loss"])
    t0 = time.time()
    drops = sel = 0
    for r in range(reps):
        st, m = tr._train_epoch(st, tr.graph_train, tr.train_features,
                                tr.labels, tr.importance_train,
                                bm(ds, batch, steps, 2 + r),
                                tr._next_key())
        drops += int(m["is_dropped"])
        sel += int(m["amt_data"])
    dt = (time.time() - t0) / (steps * reps) * 1e3
    return dt, drops / max(1, reps * steps), sel / (reps * steps)


def main():
    ds = build_reddit_like()
    base = dict(dataset="reddit_like", degree=1, test_degree=1,
                hidden1=HIDDEN, normalization="graphsage", layer_norm=True,
                num_fc_layers=2, weight_decay=0.0, dropout=0.2,
                pad_degree=PAD_DEG, seed=1)
    for batch, steps in ((512, 300), (4096, 100)):
        ns_ms = None
        for name, over in (
                ("NS+PP          ", dict()),
                ("IS+PP cap off  ", dict(importance=True)),
                ("IS+PP cap 16   ", dict(importance=True, is_slot_cap=16)),
                ("IS+PP cap 8    ", dict(importance=True, is_slot_cap=8)),
                ("IS+PP cap 4    ", dict(importance=True, is_slot_cap=4))):
            cfg = Config(batch_size=batch, **base, **over)
            tr = Trainer(cfg, ds)
            ms, dr, sel = run(tr, ds, batch, steps)
            if ns_ms is None:
                ns_ms = ms
            log(f"batch {batch}: {name} {ms:7.3f} ms/step  x{ms/ns_ms:.2f} "
                f"vs NS  dropped/step={dr:.1f} of {sel:.0f} sampled "
                f"({100*dr/max(sel,1):.2f}%)")
            del tr


if __name__ == "__main__":
    main()
