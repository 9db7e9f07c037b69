"""A/B: --lazy_fullterm (epoch-frozen CV anchor, a-bar table recompute)
on the headline bench config (CV+PP deg=1, bf16 history, hidden 128).

The lazy path replaces the per-step [F, Dcap] full-term history gather
(~90% of the step's row issues, PERF.md roofline) with one [F, d] row
gather of a precomputed a-bar table; the table recompute (N x Dcap rows,
once per epoch) runs INSIDE the same epoch dispatch, so the per-epoch
timing below always pays for it.  Row-issue arithmetic (PERF.md round 4)
says the trade only wins when S x F_out x Dcap >> N x Dcap — i.e. at
batch >= ~2k — so both arms run at the TRUE epoch step count
S = ceil(train_nodes / batch): amortizing the recompute over an
artificially long epoch would flatter the lazy arm.

Same-process A/B (cross-run tunnel variance >10%), min of reps.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax.numpy as jnp

import bench
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ds = bench.build_reddit_like()
rng = np.random.default_rng(7)
N_TRAIN = len(ds.train_d)


def bm(steps, batch):
    ids = np.resize(rng.permutation(ds.train_d), steps * batch)
    return jnp.asarray(ids.astype(np.int32).reshape(steps, batch))


def run(tag, batch, steps, reps=5, **kw):
    cfg = Config(dataset="bench", batch_size=batch, degree=1, test_degree=1,
                 cv=True, test_cv=True, hidden1=bench.HIDDEN,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2, seed=1,
                 **kw)
    tr = Trainer(cfg, ds)
    # warmup (compile + one-time fetch stall)
    tr.state, m = tr._train_epoch(
        tr.state, tr.graph_train, tr.train_features, tr.labels,
        tr.importance_train, bm(steps, batch), tr._next_key())
    _ = float(m["loss"])
    best = []
    for _ in range(reps):
        t0 = time.time()
        tr.state, m = tr._train_epoch(
            tr.state, tr.graph_train, tr.train_features, tr.labels,
            tr.importance_train, bm(steps, batch), tr._next_key())
        _ = float(m["loss"])
        best.append((time.time() - t0) / steps * 1000)
    log(f"{tag}: batch={batch} S={steps} " +
        " ".join(f"{b:.3f}" for b in best) +
        f" ms/step (min {min(best):.3f}) loss={float(m['loss']):.3f}")
    del tr
    return min(best)


hist_dtype = os.environ.get("LAZY_AB_DTYPE", "bfloat16")
for batch in (512, 4096):
    steps = -(-N_TRAIN // batch)        # TRUE epoch length
    off = run("lazy OFF", batch, steps, history_dtype=hist_dtype)
    on = run("lazy ON ", batch, steps, history_dtype=hist_dtype,
             lazy_fullterm=True)
    log(f"==> batch {batch} ({hist_dtype}): {off:.3f} -> {on:.3f} ms/step "
        f"({off / on:.2f}x)")

# The lazy trade wins only when saved rows (S x sum_l F_l x Dcap) exceed
# the recompute (n_layers x N x Dcap) by enough to also cover the chunked
# SpMM's fusion deficit.  A 3-layer model doubles the per-step full terms
# AND widens the fields — the friendliest realistic regime:
if os.environ.get("LAZY_AB_3LAYER", "1") != "0":
    batch = 4096
    steps = -(-N_TRAIN // batch)
    off = run("3L lazy OFF", batch, steps, history_dtype=hist_dtype,
              num_layers=3)
    on = run("3L lazy ON ", batch, steps, history_dtype=hist_dtype,
             num_layers=3, lazy_fullterm=True)
    log(f"==> batch {batch} 3-layer ({hist_dtype}): {off:.3f} -> "
        f"{on:.3f} ms/step ({off / on:.2f}x)")
