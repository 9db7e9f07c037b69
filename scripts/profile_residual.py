"""Decompose the non-CV residual of the train step at batch 4096.

profile_cv_terms.py attributed 3.0 of 7.75 ms/step (batch 4096) to the CV
full-neighborhood term and 0.24 ms to the delta gather, leaving ~4.0 ms
unexplained.  This ablation splits that residual into scheduler
(sampling+compaction), input-feature slicing, history scatter, and the
dense/backward/Adam core, plus the bf16-history baseline (the candidate
2x lever on the full term at this batch size).

All timings are epoch-scan (value-fetch synchronized) — standalone
per-dispatch timing on the axon tunnel measures enqueue, not execution.
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
from stochastic_gcn_tpu.models import aggregators as A
from stochastic_gcn_tpu.models import gcn as M
from stochastic_gcn_tpu.training import step as S
from stochastic_gcn_tpu.sampler.scheduler import schedule


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_cfg(batch, hist_dtype="float32"):
    return Config(dataset="reddit_like", batch_size=batch, degree=1,
                  test_degree=1, cv=True, test_cv=True, hidden1=HIDDEN,
                  normalization="graphsage", layer_norm=True,
                  num_fc_layers=2, weight_decay=0.0, dropout=0.2,
                  pad_degree=PAD_DEG, history_dtype=hist_dtype, seed=1)


def bm(ds, batch, s, seed2):
    r = np.random.default_rng(seed2)
    ids = np.resize(r.permutation(ds.train_d).astype(np.int32), s * batch)
    return jnp.asarray(ids.reshape(s, batch))


def run_epoch(tr, ds, batch, steps):
    st, m = tr._train_epoch(tr.state, tr.graph_train, tr.train_features,
                            tr.labels, tr.importance_train,
                            bm(ds, batch, steps, 1), tr._next_key())
    _ = float(m["loss"])
    t0 = time.time()
    st, m = tr._train_epoch(st, tr.graph_train, tr.train_features,
                            tr.labels, tr.importance_train,
                            bm(ds, batch, steps, 2), tr._next_key())
    _ = float(m["loss"])
    return (time.time() - t0) / steps * 1e3


def stub_full(hist, graph, field_out, square=False, use_pallas=False,
              mesh=None):
    return jnp.zeros((field_out.shape[0], hist.shape[1]), jnp.float32)


def stub_scatter(histories, new_histories, fields, num_nodes):
    return histories


def stub_slice(features, field0):
    if hasattr(features, "idx"):
        return M.PaddedSparseFeatures(idx=features.idx[field0],
                                      val=features.val[field0],
                                      dim=features.dim)
    return jnp.zeros((field0.shape[0], features.shape[1]), features.dtype)


REAL = dict(full=A.full_neighborhood_mean, scatter=S.scatter_histories,
            slice=M._slice_inputs)


def ablate(ds, batch, steps):
    log(f"\n=== residual ablation, batch={batch}, {steps} steps ===")
    variants = [
        ("baseline f32", "float32", {}),
        ("baseline bf16 history", "bfloat16", {}),
        ("full term stubbed", "float32", {"full": stub_full}),
        ("scatter stubbed", "float32", {"scatter": stub_scatter}),
        ("feature slice stubbed", "float32", {"slice": stub_slice}),
        ("full+scatter+slice stubbed", "float32",
         {"full": stub_full, "scatter": stub_scatter, "slice": stub_slice}),
        ("bf16 + scatter stubbed", "bfloat16", {"scatter": stub_scatter}),
    ]
    for name, hd, patches in variants:
        A.full_neighborhood_mean = patches.get("full", REAL["full"])
        S.scatter_histories = patches.get("scatter", REAL["scatter"])
        M._slice_inputs = patches.get("slice", REAL["slice"])
        try:
            tr = Trainer(make_cfg(batch, hd), ds)
            ms = run_epoch(tr, ds, batch, steps)
            log(f"  {name:30s} {ms:7.3f} ms/step")
            del tr
        finally:
            A.full_neighborhood_mean = REAL["full"]
            S.scatter_histories = REAL["scatter"]
            M._slice_inputs = REAL["slice"]


def sched_only(ds, batch, steps):
    """Scheduler cost in isolation (same scan/fetch protocol)."""
    cfg = make_cfg(batch)
    tr = Trainer(cfg, ds)
    graph = tr.graph_train
    degrees = tr.train_degrees

    @jax.jit
    def epoch(graph, batch_matrix, key):
        def body(c, b):
            pack = schedule(jax.random.fold_in(key, c.astype(jnp.int32)),
                            graph, b, degrees, True)
            return c + jnp.sum(pack.fields[-1]).astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), batch_matrix)
        return c

    k = tr._next_key()
    _ = float(epoch(graph, bm(ds, batch, steps, 1), k))
    t0 = time.time()
    _ = float(epoch(graph, bm(ds, batch, steps, 2), k))
    log(f"  scheduler only ({batch})          "
        f"{(time.time() - t0) / steps * 1e3:7.3f} ms/step")
    del tr


log(f"devices={jax.devices()}")
ds = build_reddit_like()
ablate(ds, 4096, 60)
sched_only(ds, 4096, 60)
ablate(ds, 512, 200)
sched_only(ds, 512, 200)
