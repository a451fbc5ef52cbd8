import time, jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _flagship_cfg
from casmtr_tpu.models.casmtr import CasMTR
from casmtr_tpu.train import supervision as spv
from casmtr_tpu.train.loss import casmtr_loss

size = 704
cfg = _flagship_cfg(train_size=size)
lcfg = cfg.loftr
model = CasMTR(lcfg)
rng = np.random.default_rng(0)
B = 1
mk = lambda: jnp.asarray(rng.random((B, size, size, 3)), jnp.float32)
K = jnp.asarray(np.tile(np.array([[100.0,0,size/2],[0,100.0,size/2],[0,0,1]],np.float32),(B,1,1)))
T = jnp.asarray(np.tile(np.eye(4,dtype=np.float32),(B,1,1)))
batch = {"image0": mk(), "image1": mk(),
         "depth0": jnp.ones((B,size,size),jnp.float32),
         "depth1": jnp.ones((B,size,size),jnp.float32),
         "K0": K, "K1": K, "T_0to1": T, "T_1to0": T}
variables = model.init(jax.random.PRNGKey(0), batch, train=False)

def timed(name, fn, *args, n=5):
    o = fn(*args)
    s = float(jax.tree_util.tree_leaves(o)[0].sum())  # force full sync
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*args)
        s = float(jax.tree_util.tree_leaves(o)[0].sum())
    print(f"{name}: {(time.perf_counter()-t0)/n:.4f}s", flush=True)

# 1. supervision only
sup = jax.jit(lambda b: spv.compute_supervision(b, lcfg))
timed("supervision", sup, batch)

# 2. inference forward
fwd = jax.jit(lambda v, b: model.apply(v, b, train=False).coarse.next_conf_c01)
timed("forward_eval", fwd, variables, batch)

# 3. train-mode forward + loss (no grad)
gt = sup(batch)
tb = dict(batch); tb["gt_idx_4c"] = gt["gt_idx_4c"]; tb["gt_mask_4c"] = gt["gt_mask_4c"]
def fwd_loss(params, bs, b, gt):
    out, _ = model.apply({"params": params, "batch_stats": bs}, b, train=True, mutable=["batch_stats"])
    eg = spv.fine_expec_gt(gt, list(out.cascades.values())[-1].matches, b, lcfg)
    loss, _ = casmtr_loss(out, gt, eg, lcfg)
    return loss
floss = jax.jit(fwd_loss)
timed("forward_loss", floss, variables["params"], variables.get("batch_stats", {}), tb, gt)

# 4. grad
gloss = jax.jit(lambda p, bs, b, g: jax.grad(fwd_loss)(p, bs, b, g))
timed("grad", gloss, variables["params"], variables.get("batch_stats", {}), tb, gt, n=3)
