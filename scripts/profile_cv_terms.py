"""Decompose the CV+PP step cost on the bench graph (VERDICT r1 #4/#6).

Two experiments, real TPU:

A. Microbench the full-neighborhood contraction at the step's real shapes
   ([F, Dcap] rows gathered from the [N+1, d] history):
     - gather+einsum default precision        (current production path)
     - gather+einsum precision=HIGHEST        (f32-emulated MXU passes)
     - gather + f32 multiply-reduce on VPU    (candidate: accurate AND fast)
     - gather only                            (the irreducible gather cost)
   each for f32 and bf16 history, with abs error vs a float64 oracle.

B. Ablate the real train step (epoch scan, 200 steps): baseline vs
   full-term-stubbed vs delta-term-stubbed vs history-scatter-stubbed,
   at batch 512 and 4096 — attributes step time to CV components.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_reddit_like, BATCH, HIDDEN, PAD_DEG
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer
from stochastic_gcn_tpu.models import aggregators as A


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=50):
    # round 4: block_until_ready does NOT synchronize through the axon
    # tunnel (verify skill) — close the window with a value fetch; the
    # per-window fetch overhead (~0.3 ms) is amortized over reps
    out = fn(*args)
    _ = float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    return (time.time() - t0) / reps * 1e3, out


def bench_reductions(n, d, f, k, seed=0):
    log(f"\n=== A. contraction microbench: N={n} d={d} F={f} Dcap={k} ===")
    rng = np.random.default_rng(seed)
    hist64 = rng.normal(size=(n + 1, d))
    idx = rng.integers(0, n, size=(f, k)).astype(np.int32)
    w64 = (rng.random(size=(f, k)) * (rng.random((f, k)) < 0.2)) / k
    oracle = np.einsum("fk,fkd->fd", w64, hist64[idx])

    idx_d = jnp.asarray(idx)
    w_d = jnp.asarray(w64.astype(np.float32))

    def run(name, fn, table):
        ms, out = timeit(jax.jit(fn), table, idx_d, w_d)
        err = float(np.abs(np.asarray(out, np.float64) - oracle).max())
        log(f"  {name:34s} {ms:7.3f} ms   max_abs_err={err:.2e}")
        return ms

    for dt, tag in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        table = jnp.asarray(hist64, dtype=dt)
        run(f"[{tag}] gather+einsum (default)",
            lambda t, i, w: jnp.einsum("fk,fkd->fd", w,
                                       jnp.take(t, i, axis=0)), table)
        run(f"[{tag}] gather+einsum HIGHEST",
            lambda t, i, w: jnp.einsum(
                "fk,fkd->fd", w, jnp.take(t, i, axis=0),
                precision=jax.lax.Precision.HIGHEST), table)
        run(f"[{tag}] gather+mulsum f32",
            lambda t, i, w: (w[:, :, None]
                             * jnp.take(t, i, axis=0).astype(jnp.float32)
                             ).sum(axis=1), table)
        run(f"[{tag}] gather only",
            lambda t, i, w: jnp.take(t, i, axis=0).astype(jnp.float32)
            .sum(axis=1), table)


def ablate_step(ds, batch, steps=200):
    log(f"\n=== B. step ablation, batch={batch} ===")
    cfg = Config(dataset="reddit_like", batch_size=batch, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=HIDDEN,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2,
                 pad_degree=PAD_DEG, seed=1)
    rng = np.random.default_rng(0)

    def bm(s, seed2):
        r = np.random.default_rng(seed2)
        ids = np.resize(r.permutation(ds.train_d).astype(np.int32), s * batch)
        return jnp.asarray(ids.reshape(s, batch))

    real_full = A.full_neighborhood_mean
    real_fanout = A.fanout_gather
    real_hgather = A.history_gather

    def stub_full(hist, graph, field_out, square=False, use_pallas=False,
                  mesh=None):
        return jnp.zeros((field_out.shape[0], hist.shape[1]), jnp.float32)

    def stub_hgather(hist, ids, mesh=None):
        return jnp.zeros((ids.shape[0], hist.shape[1]), hist.dtype)

    variants = [
        ("baseline", {}),
        ("full_term_stubbed", {"full_neighborhood_mean": stub_full}),
        ("delta_gather_stubbed", {"history_gather": stub_hgather}),
        ("both_stubbed", {"full_neighborhood_mean": stub_full,
                          "history_gather": stub_hgather}),
        ("mulsum_full_term", {"full_neighborhood_mean": "mulsum"}),
    ]

    def mulsum_full(hist, graph, field_out, square=False, use_pallas=False,
                    mesh=None):
        fnbr = jnp.take(graph.nbr, field_out, axis=0)
        fw = jnp.take(graph.w, field_out, axis=0)
        if square:
            fw = jnp.square(fw)
        rows = jnp.take(hist, fnbr, axis=0).astype(jnp.float32)
        return (fw[:, :, None] * rows).sum(axis=1)

    for name, patches in variants:
        for attr, val in patches.items():
            setattr(A, attr, mulsum_full if val == "mulsum" else val)
        try:
            tr = Trainer(cfg, ds)
            st, m = tr._train_epoch(tr.state, tr.graph_train,
                                    tr.train_features, tr.labels,
                                    tr.importance_train, bm(steps, 1),
                                    tr._next_key())
            _ = float(m["loss"])
            t0 = time.time()
            st, m = tr._train_epoch(st, tr.graph_train, tr.train_features,
                                    tr.labels, tr.importance_train,
                                    bm(steps, 2), tr._next_key())
            _ = float(m["loss"])
            ms = (time.time() - t0) / steps * 1e3
            log(f"  {name:24s} {ms:7.3f} ms/step")
            del tr, st
        finally:
            A.full_neighborhood_mean = real_full
            A.fanout_gather = real_fanout
            A.history_gather = real_hgather


log(f"devices={jax.devices()}")
ds = build_reddit_like()
n = ds.num_data

# shapes mirroring the production step: batch 512 -> F=512 out-field rows,
# and batch 4096
bench_reductions(n, HIDDEN, 512, PAD_DEG)
bench_reductions(n, HIDDEN, 4096, PAD_DEG)

ablate_step(ds, 512)
ablate_step(ds, 4096, steps=60)
