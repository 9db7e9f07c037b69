"""Same-process A/B of the scheduler pre-pass (--sched_prepass) on the
headline bench config (CV+PP deg=1, bf16 history) at batch 512 and 4096,
plus the no-dedup layout with and without the pre-pass.  Cross-run numbers
through the axon tunnel vary >10%; only same-process comparisons count."""
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
    for r in range(reps):
        st, m = tr._train_epoch(st, tr.graph_train, tr.train_features,
                                tr.labels, tr.importance_train,
                                bm(ds, batch, steps, 2 + r),
                                tr._next_key())
    _ = float(m["loss"])
    return (time.time() - t0) / (steps * reps) * 1e3


def main():
    ds = build_reddit_like()
    base = dict(dataset="reddit_like", degree=1, test_degree=1, cv=True,
                test_cv=True, hidden1=HIDDEN, normalization="graphsage",
                layer_norm=True, num_fc_layers=2, weight_decay=0.0,
                dropout=0.2, pad_degree=PAD_DEG, seed=1)
    for batch, steps in ((512, 300), (4096, 100)):
        for name, over in (
                ("prepass off          ", dict(sched_prepass="off")),
                ("prepass on           ", dict(sched_prepass="on")),
                ("prepass off, no-dedup", dict(sched_prepass="off",
                                               field_dedup=False)),
                ("prepass on,  no-dedup", dict(sched_prepass="on",
                                               field_dedup=False))):
            cfg = Config(batch_size=batch, **base, **over)
            tr = Trainer(cfg, ds)
            ms = run(tr, ds, batch, steps)
            eps = batch / ms * 1e3
            log(f"batch {batch}: {name}  {ms:.3f} ms/step  "
                f"{eps/1e3:.0f}k edges/s  vs_baseline={eps/3.9e5:.2f}")
            del tr


if __name__ == "__main__":
    main()
