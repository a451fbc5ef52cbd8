import time, jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _flagship_cfg
from casmtr_tpu.models.backbone import build_backbone
from casmtr_tpu.models.transformer import LocalFeatureTransformer
from casmtr_tpu.ops import matching
from casmtr_tpu.ops.position_encoding import add_sine_pe_norm

size = 704
cfg = _flagship_cfg(train_size=size).loftr
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((2, size, size, 3)), jnp.float32)

def timed(name, fn, *args, n=5):
    o = fn(*args); s = float(jax.tree_util.tree_leaves(o)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*args); s = float(jax.tree_util.tree_leaves(o)[0].sum())
    print(f"{name}: {(time.perf_counter()-t0)/n:.4f}s", flush=True)

bb = build_backbone(cfg)
pb = bb.init(jax.random.PRNGKey(0), img, train=False)
f_bb = jax.jit(lambda v, x: bb.apply(v, x, train=False)[0])
timed("backbone", f_bb, pb, img)

feats = bb.apply(pb, img, train=False)
f8 = feats[0]
h8 = f8.shape[1]
x8 = add_sine_pe_norm(f8, (size//8, size//8))
t80, t81 = jnp.split(x8.reshape(2, -1, x8.shape[-1]), 2, axis=0)

# train_mode=True: train-step budget attribution (dtype policy is per-mode)
lft = LocalFeatureTransformer(cfg.coarse, size//8, train_mode=True)
pl_ = lft.init(jax.random.PRNGKey(0), t80, t81, (h8,h8), (h8,h8))
f_coarse = jax.jit(lambda v, a, b: lft.apply(v, a, b, (h8,h8), (h8,h8))[0])
timed("coarse_transformer(6 quadtree layers)", f_coarse, pl_, t80, t81)

f_ds = jax.jit(lambda a, b: matching.dual_softmax(a, b, 0.1).conf_matrix)
timed("dual_softmax", f_ds, t80, t81)

conf = f_ds(t80, t81)
f_ex = jax.jit(lambda c: matching.extract_coarse_matches(
    c, 0.2, 0, (h8,h8), (h8,h8), 2048, 8.0).mconf)
timed("extract_matches", f_ex, conf)
