import time, jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _flagship_cfg
from casmtr_tpu.models.transformer import LocalFeatureTransformer

size = 704
cfg = _flagship_cfg(train_size=size).loftr
rng = np.random.default_rng(0)
h8 = size // 8
t80 = jnp.asarray(rng.standard_normal((1, h8*h8, 256)).astype(np.float32))
t81 = jnp.asarray(rng.standard_normal((1, h8*h8, 256)).astype(np.float32))
# train_mode=True: this microbench feeds the TRAIN-step budget (PERF.md),
# and the dtype policy is mode-dependent (f32 train / bf16 eval)
lft = LocalFeatureTransformer(cfg.coarse, h8, train_mode=True)
params = lft.init(jax.random.PRNGKey(0), t80, t81, (h8,h8), (h8,h8))
N = 4

def chain(v, a, b):
    def body(i, c):
        o0, o1 = lft.apply(v, c, b, (h8,h8), (h8,h8))
        return c + 1e-6 * o0
    return jax.lax.fori_loop(0, N, body, a)

f = jax.jit(chain)
o = f(params, t80, t81); s = float(o.sum())
t0 = time.perf_counter()
o = f(params, t80, t81); s = float(o.sum())
print(f"transformer fwd: {((time.perf_counter()-t0-0.029)/N)*1000:.2f}ms", flush=True)
