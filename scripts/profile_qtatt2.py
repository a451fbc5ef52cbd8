import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from casmtr_tpu.ops.quadtree import block_gather, to_block_major, topk_lastaxis_at

rng = np.random.default_rng(0)
B, H, D = 1, 8, 32
Lk, P, K = 7744, 1936, 16
k = jnp.asarray(rng.standard_normal((B, Lk, H, D)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, Lk//4, (B, P, K, H)).astype(np.int32))
q = jnp.asarray(rng.standard_normal((B, P, 4, H, D)).astype(np.float32))
N = 20

def bench(name, chained_fn, *args):
    f = jax.jit(chained_fn)
    o = f(*args); s = float(jax.tree_util.tree_leaves(o)[0].sum())
    t0 = time.perf_counter()
    o = f(*args); s = float(jax.tree_util.tree_leaves(o)[0].sum())
    dt = (time.perf_counter()-t0 - 0.029) / N
    print(f"{name}: {dt*1000:.2f}ms/op", flush=True)

kb = to_block_major(k, 88, 88)

def chain_gather(kb, idx):
    def body(i, c):
        out = block_gather(c, idx)
        return c + 1e-12 * out.mean()
    return jax.lax.fori_loop(0, N, body, kb)
bench("block_gather", chain_gather, kb, idx)

kg = block_gather(kb, idx)
def chain_score(q, kg):
    def body(i, c):
        out = jnp.einsum("bpfhd,bpkhjd->bpfkjh", c, kg, preferred_element_type=jnp.float32)
        return c + 1e-12 * out.mean()
    return jax.lax.fori_loop(0, N, body, q)
bench("score_einsum", chain_score, q, kg)

qk = jnp.einsum("bpfhd,bpkhjd->bpfkjh", q, kg).reshape(B,P,4,4*K,H)
def chain_sm(qk):
    def body(i, c):
        return c + 1e-12 * jax.nn.softmax(c, axis=3).mean()
    return jax.lax.fori_loop(0, N, body, qk)
bench("softmax64", chain_sm, qk)

def chain_topk(qk):
    def body(i, c):
        v, _ = topk_lastaxis_at(c, 8, axis=3)
        return c + 1e-12 * v.mean()
    return jax.lax.fori_loop(0, N, body, qk)
bench("topk8of64", chain_topk, qk)
