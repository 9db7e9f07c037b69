"""Same-process A/B of the headline bench config (CV+PP deg=1, batch 512,
bf16 history): degree-1 sampling fast path vs [F,Dcap] argmax, sorted-
segment scatter vs plain scatter.  Cross-run bench numbers through the
axon tunnel vary by >10%; only same-process A/Bs are trustworthy."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_reddit_like, HIDDEN, PAD_DEG, BATCH
from stochastic_gcn_tpu.config import Config
from stochastic_gcn_tpu.training.loop import Trainer
from stochastic_gcn_tpu.sampler import scheduler as S
from stochastic_gcn_tpu.training import step as T


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


def expand_argmax(key, graph, field_out, degree, need_aw, mesh=None):
    """Round-1 degree-1 path: [F, Dcap] uniforms + argmax."""
    from stochastic_gcn_tpu.data.graph import graph_rows
    dcap = graph.pad_degree
    rows_nbr, rows_w, deg = graph_rows(graph, field_out, mesh)
    f = field_out.shape[0]
    k = min(degree, dcap)
    u = jax.random.uniform(key, (f, dcap))
    valid = (jnp.arange(dcap, dtype=jnp.int32)[None, :] < deg[:, None])
    u = jnp.where(valid, u, -1.0)
    if k == 1:
        sel = jnp.argmax(u, axis=1).astype(jnp.int32)[:, None]
    else:
        _, sel = jax.lax.top_k(u, k)
    nbr_id = jnp.take_along_axis(rows_nbr, sel, axis=1)
    base_w = jnp.take_along_axis(rows_w, sel, axis=1)
    adj_size = jnp.minimum(deg, k)
    scale = jnp.where(deg == 0, 1.0,
                      deg.astype(jnp.float32)
                      / jnp.maximum(adj_size, 1).astype(jnp.float32))
    slot_w = base_w * scale[:, None]
    slot_aw = base_w * slot_w if need_aw else None
    scales = jax.lax.rsqrt(scale)
    return nbr_id, slot_w, slot_aw, scales


def plain_scatter(h, ids, rows, bounds):
    return h.at[ids].set(rows.astype(h.dtype), unique_indices=True)


def main():
    log(f"devices={jax.devices()}")
    ds = build_reddit_like()
    cfg = Config(dataset="reddit_like", batch_size=BATCH, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=HIDDEN,
                 normalization="graphsage", layer_norm=True,
                 num_fc_layers=2, weight_decay=0.0, dropout=0.2,
                 pad_degree=PAD_DEG, seed=1)
    real_expand = S.expand_uniform
    real_scatter = T._segment_sorted_scatter
    for batch, steps in ((512, 300), (4096, 100)):
        log(f"\n=== batch={batch} bf16 history ===")
        for name, expand, scat in (
                ("fastpath + sorted scatter", real_expand, real_scatter),
                ("argmax  + sorted scatter", expand_argmax, real_scatter),
                ("fastpath + plain scatter", real_expand, plain_scatter),
                ("argmax  + plain scatter", expand_argmax, plain_scatter)):
            S.expand_uniform = expand
            T._segment_sorted_scatter = scat
            try:
                tr = Trainer(cfg.replace(batch_size=batch), ds)
                ms = run(tr, ds, batch, steps)
                log(f"  {name:28s} {ms:7.3f} ms/step")
                del tr
            finally:
                S.expand_uniform = real_expand
                T._segment_sorted_scatter = real_scatter


if __name__ == "__main__":
    main()
