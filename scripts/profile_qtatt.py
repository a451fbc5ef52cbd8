import time, jax, jax.numpy as jnp, numpy as np
from casmtr_tpu.ops.quadtree import block_gather, to_block_major, topk_lastaxis_at

rng = np.random.default_rng(0)
B, H, D = 1, 8, 32
# level 0 of the 1/8 pyramid at 704^2: Lk = 88^2 = 7744, P = 1936, K = 16
Lk, P, K = 7744, 1936, 16
k = jnp.asarray(rng.standard_normal((B, Lk, H, D)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, Lk//4, (B, P, K, H)).astype(np.int32))
q = jnp.asarray(rng.standard_normal((B, P, 4, H, D)).astype(np.float32))

def timed(name, fn, *args, n=10):
    o = fn(*args); s = float(jax.tree_util.tree_leaves(o)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*args); s = float(jax.tree_util.tree_leaves(o)[0].sum())
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f}ms", flush=True)

tbm = jax.jit(lambda k: to_block_major(k, 88, 88))
timed("to_block_major", tbm, k)
kb = tbm(k)
g = jax.jit(lambda kb, idx: block_gather(kb, idx))
timed("block_gather(level0)", g, kb, idx)
kg = g(kb, idx)

f_sc = jax.jit(lambda q, kg: jnp.einsum("bpfhd,bpkhjd->bpfkjh", q, kg, preferred_element_type=jnp.float32))
timed("score_einsum", f_sc, q, kg)
qk = f_sc(q, kg).reshape(B, P, 4, 4*K, H)

f_sm = jax.jit(lambda qk: jax.nn.softmax(qk, axis=3))
timed("softmax", f_sm, qk)
A = f_sm(qk)

f_tk = jax.jit(lambda A: topk_lastaxis_at(A, 8, axis=3)[1])
timed("topk(k=8 over 64)", f_tk, A)

f_ag = jax.jit(lambda A, kg: jnp.einsum("bpfkjh,bpkhjd->bpfhd", A.reshape(B,P,4,K,4,H), kg, preferred_element_type=jnp.float32))
timed("aggregate_einsum", f_ag, A, kg)

# coarse level full attention 484 tokens
qc = jnp.asarray(rng.standard_normal((B, 484, H, D)).astype(np.float32))
f_full = jax.jit(lambda q, k: jnp.einsum("blhd,bshd->blsh", q, k))
timed("coarse_full_attn", f_full, qc, qc)
