"""Diagnose the in-scan slowdown (PERF.md "Edge-list layout", ROADMAP #0).

Round-1 finding: the same jitted train step runs ~10x slower inside the
donated-carry ``lax.scan`` epoch body than standalone (0.66 vs 6.7 ms for the
edgelist step).  This script isolates the cause by timing a variant matrix in
ONE process (paying the axon one-time fetch stall once):

  pyloop_blocked    jitted step, python loop, block every step  (true latency)
  pyloop_amortized  jitted step, python loop, block at the end  (dispatch-bound
                    upper throughput)
  scan_donate       current make_train_epoch (donated carry, stacked ys)
  scan_nodonate     same scan without donate_argnums
  scan_noys         scan whose body returns ONLY the carry (metrics dead-coded)
  fori              lax.fori_loop over dynamic_index_in_dim'd batches

and dumps the optimized HLO of the standalone step and the scan epoch to
/tmp/hlo_step_<tag>.txt / /tmp/hlo_scan_<tag>.txt for instruction-level diffs.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.data.graph import Dataset
from stochastic_gcn_tpu.data import preprocess as P
from stochastic_gcn_tpu.training.loop import Trainer
from stochastic_gcn_tpu.training import step as S


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 100_000
FEAT = 128
CLS = 16
BATCH = 512
STEPS = 200

rng = np.random.default_rng(0)
deg = np.minimum((2.0 / rng.power(2.2, N)).astype(np.int64), 2000)
src = np.repeat(np.arange(N, dtype=np.int32), deg)
dst = rng.integers(0, N, size=src.shape[0], dtype=np.int32)
keep = src != dst
edges = np.stack([src[keep], dst[keep]], 1)
adj01 = (P.adj_from_edges(edges, N) > 0).astype(np.float32)
full_adj = P.graphsage_normalize_adj(adj01)
d = np.diff(full_adj.indptr)
log(f"graph: N={N} E={full_adj.nnz} mean_deg={d.mean():.1f} max={d.max()}")

feats = rng.normal(size=(N, FEAT)).astype(np.float32)
labels = np.zeros((N, CLS), np.float32)
labels[np.arange(N), rng.integers(0, CLS, N)] = 1
perm = rng.permutation(N).astype(np.int32)
train_d = np.sort(perm[:N // 2])
train_feats = full_adj.dot(feats)
ds = Dataset(num_data=N, train_adj=full_adj, full_adj=full_adj,
             feats=feats, train_feats=train_feats, test_feats=train_feats,
             labels=labels, train_d=train_d,
             val_d=np.sort(perm[N // 2:N // 2 + N // 4]),
             test_d=np.sort(perm[N // 2 + N // 4:]))


def bm(steps, seed=1):
    r = np.random.default_rng(seed)
    ids = np.resize(r.permutation(train_d), steps * BATCH).astype(np.int32)
    return jnp.asarray(ids.reshape(steps, BATCH))


def hlo_counts(txt):
    import re
    body = txt
    # focus on the while-body computation when present
    counts = {}
    for op in ("gather(", "dynamic-slice(", "dynamic-update-slice(",
               "copy(", "fusion(", "scatter(", "all-gather(",
               "transpose(", "reshape("):
        counts[op.rstrip("(")] = len(re.findall(re.escape(" " + op), body)) \
            + len(re.findall(re.escape("= " + op), body))
    return counts


def run_matrix(tag, **cfg_kw):
    cfg = Config(dataset="powerlaw", batch_size=BATCH, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=64,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2, seed=1,
                 **cfg_kw)
    tr = Trainer(cfg, ds)
    n = ds.num_data
    raw_step = S.build_train_step(cfg, tr.train_spec, tr.train_degrees, n)
    args = (tr.graph_train, tr.train_features, tr.labels,
            tr.importance_train)
    key = tr._next_key()
    results = {}

    # --- standalone jitted step ------------------------------------------
    jstep = jax.jit(raw_step, donate_argnums=(0,))
    batches = bm(STEPS)
    state, m = jstep(tr.state, *args, batches[0], key)
    t_warm = time.time()
    _ = float(m["loss"])           # absorb the one-time fetch stall
    log(f"[{tag}] warm fetch took {time.time()-t_warm:.1f}s")

    # pyloop blocked
    t0 = time.time()
    for i in range(STEPS):
        state, m = jstep(state, *args, batches[i], key)
        jax.block_until_ready(m["loss"])
    results["pyloop_blocked"] = (time.time() - t0) / STEPS * 1e3

    # pyloop amortized (block only at end)
    t0 = time.time()
    for i in range(STEPS):
        state, m = jstep(state, *args, batches[i], key)
    jax.block_until_ready(state.step)
    results["pyloop_amortized"] = (time.time() - t0) / STEPS * 1e3

    try:
        step_txt = jax.jit(raw_step).lower(
            state, *args, batches[0], key).compile().as_text()
        with open(f"/tmp/hlo_step_{tag}.txt", "w") as f:
            f.write(step_txt)
        log(f"[{tag}] step HLO ops: {hlo_counts(step_txt)}")
    except Exception as e:
        log(f"[{tag}] step HLO dump failed: {e}")

    def timed_epoch(fn, st, batches, label, fetch):
        st2 = fn(st, *args, batches, key)
        jax.block_until_ready(fetch(st2))
        t0 = time.time()
        st3 = fn(st2, *args, batches, key)
        jax.block_until_ready(fetch(st3))
        results[label] = (time.time() - t0) / STEPS * 1e3
        return st3

    # --- scan with donation (current production path) --------------------
    epoch = S.build_train_epoch(cfg, tr.train_spec, tr.train_degrees, n)
    jepoch_d = jax.jit(epoch, donate_argnums=(0,))
    state = timed_epoch(lambda st, *a: jepoch_d(st, *a)[0], state,
                        bm(STEPS, 2), "scan_donate", lambda s: s.step)
    try:
        scan_txt = jepoch_d.lower(state, *args, bm(STEPS, 2),
                                  key).compile().as_text()
        with open(f"/tmp/hlo_scan_{tag}.txt", "w") as f:
            f.write(scan_txt)
        log(f"[{tag}] scan HLO ops: {hlo_counts(scan_txt)}")
    except Exception as e:
        log(f"[{tag}] scan HLO dump failed: {e}")

    # --- scan without donation -------------------------------------------
    jepoch_nd = jax.jit(epoch)
    state = timed_epoch(lambda st, *a: jepoch_nd(st, *a)[0], state,
                        bm(STEPS, 3), "scan_nodonate", lambda s: s.step)

    # --- scan that returns only the carry (ys dead-coded) ----------------
    def epoch_noys(st, graph, features, labels_, importance, batches_, k):
        def body(s, ids):
            s, _m = raw_step(s, graph, features, labels_, importance,
                             ids, k)
            return s, None
        st, _ = jax.lax.scan(body, st, batches_)
        return st
    jepoch_noys = jax.jit(epoch_noys, donate_argnums=(0,))
    state = timed_epoch(jepoch_noys, state, bm(STEPS, 4), "scan_noys",
                        lambda s: s.step)

    # --- fori_loop --------------------------------------------------------
    def epoch_fori(st, graph, features, labels_, importance, batches_, k):
        def body(i, s):
            ids = jax.lax.dynamic_index_in_dim(batches_, i, 0,
                                               keepdims=False)
            s, _m = raw_step(s, graph, features, labels_, importance,
                             ids, k)
            return s
        return jax.lax.fori_loop(0, batches_.shape[0], body, st)
    jepoch_fori = jax.jit(epoch_fori, donate_argnums=(0,))
    state = timed_epoch(jepoch_fori, state, bm(STEPS, 5), "fori",
                        lambda s: s.step)

    log(f"[{tag}] RESULTS (ms/step over {STEPS}):")
    for k, v in results.items():
        log(f"  {k:18s} {v:8.3f}")
    del tr, state
    return results


log(f"jax {jax.__version__} devices={jax.devices()}")
run_matrix("edgelist", graph_format="edgelist", fadj_edge_mult=8.0)
run_matrix("padded")
