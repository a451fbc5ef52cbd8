import time, jax, jax.numpy as jnp, numpy as np
from casmtr_tpu.ops import quadtree as qt

rng = np.random.default_rng(0)
B, H, D = 1, 8, 32
sizes = [(88, 88), (44, 44), (22, 22)]
mk = lambda h, w: jnp.asarray(rng.standard_normal((B, h*w, H, D)).astype(np.float32))
qs = [mk(*s) for s in sizes]
ks = [mk(*s) for s in sizes]
vs = [mk(*s) for s in sizes]
wt = jnp.zeros(3)
N = 10

def bench(name, chained_fn, *args):
    f = jax.jit(chained_fn)
    o = f(*args); s = float(jax.tree_util.tree_leaves(o)[0].sum())
    t0 = time.perf_counter()
    o = f(*args); s = float(jax.tree_util.tree_leaves(o)[0].sum())
    dt = (time.perf_counter()-t0 - 0.029) / N
    print(f"{name}: {dt*1000:.2f}ms/op", flush=True)

def chain_qtatt(q0, k0, v0):
    def body(i, c):
        out = qt.qtatt_b([c, qs[1], qs[2]], ks, vs, sizes, [32,16,8], wt)
        return c + 1e-12 * out.mean()
    return jax.lax.fori_loop(0, N, body, q0)
bench("qtatt_b_full_call", chain_qtatt, qs[0], ks[0], vs[0])

# and the coarse+fine levels separately
def chain_coarse(qc):
    def body(i, c):
        A, msg, ts_, ti = qt._coarse_level(c, ks[2], vs[2], 32)
        return c + 1e-12 * msg.mean()
    return jax.lax.fori_loop(0, N, body, qs[2])
bench("coarse_level(484, topk32)", chain_coarse, qs[2])
