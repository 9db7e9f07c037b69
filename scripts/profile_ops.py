import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, file=sys.stderr, flush=True)
N = 233001
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.choice(N, 1024, replace=False).astype(np.int32))
rows = jnp.asarray(rng.normal(size=(1024,128)).astype(np.float32))
big = jnp.zeros((N,128), jnp.float32)
mask = jnp.asarray(rng.random(N) < 0.01)

def bench(name, fn, *args, iters=10):
    f = jax.jit(fn)
    t0=time.time(); r = f(*args); jax.block_until_ready(r); tc = time.time()-t0
    t0=time.time()
    for _ in range(iters): r = f(*args)
    jax.block_until_ready(r)
    log(f"{name}: compile {tc:.2f}s, {1000*(time.time()-t0)/iters:.2f} ms/it")

bench("cumsum_233k", lambda m: jnp.cumsum(m.astype(jnp.int32)), mask)
bench("bool_scatter", lambda i: jnp.zeros(N, bool).at[i].set(True), ids)
bench("row_scatter", lambda b,i,r: b.at[i].set(r), big, ids, rows)
bench("row_gather", lambda b,i: jnp.take(b, i, axis=0), big, ids)
bench("iota_scatter_drop", lambda i: jnp.full(2048, N, jnp.int32).at[jnp.where(mask, jnp.cumsum(mask.astype(jnp.int32))-1, 2048)].set(jnp.arange(N, dtype=jnp.int32), mode="drop"), ids)
bench("topk_rows", lambda u: jax.lax.top_k(u, 1), jnp.asarray(rng.random((1024,128)).astype(np.float32)))
