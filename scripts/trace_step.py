import sys; sys.path.insert(0, "/root/repo")
import jax, numpy as np, jax.numpy as jnp, glob, gzip, json, collections, os
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from __graft_entry__ import _flagship_cfg
from casmtr_tpu.models.casmtr import CasMTR
from casmtr_tpu.train.train_step import init_train_state, make_train_step

size = 704
cfg = _flagship_cfg(train_size=size)
from casmtr_tpu.config import override
cfg = override(cfg, {"loftr": {"remat": False}})  # match bench.py
model = CasMTR(cfg.loftr)
rng = np.random.default_rng(0)
B = 1
K = jnp.asarray(np.tile(np.array([[100.0,0,size/2],[0,100.0,size/2],[0,0,1]],np.float32),(B,1,1)))
T = jnp.asarray(np.tile(np.eye(4,dtype=np.float32),(B,1,1)))
batch = {"image0": jnp.asarray(rng.random((B,size,size,3)),jnp.float32),
         "image1": jnp.asarray(rng.random((B,size,size,3)),jnp.float32),
         "depth0": jnp.ones((B,size,size),jnp.float32),
         "depth1": jnp.ones((B,size,size),jnp.float32),
         "K0": K, "K1": K, "T_0to1": T, "T_1to0": T}
state, tx = init_train_state(model, cfg, batch, jax.random.PRNGKey(0), 1000, 1e-3)
step = jax.jit(make_train_step(model, cfg, tx))
state, sc = step(state, batch)
print("warm loss", float(sc["loss"]), flush=True)
with jax.profiler.trace("/tmp/jtrace_step"):
    state, sc = step(state, batch)
    _ = float(sc["loss"])
d = sorted(glob.glob('/tmp/jtrace_step/plugins/profile/*'))[-1]
tr = json.load(gzip.open(glob.glob(d + '/*.trace.json.gz')[0]))
ev = [e for e in tr.get("traceEvents", []) if e.get("ph") == "X"]
rows = []
for e in ev:
    n = e.get("name","?")
    if n.startswith("$") or "block_until" in n: continue
    src = str((e.get("args") or {}).get("tf_op") or "")[:95]
    rows.append((e.get("dur",0), n, src))
agg = collections.defaultdict(float)
for dur, n, src in rows:
    key = src if src else n.split(".")[0]
    agg[key] += dur
print("TOTAL device-attributed ms:", sum(agg.values())/1000, flush=True)
for key, dur in sorted(agg.items(), key=lambda x:-x[1])[:40]:
    print(f"{dur/1000:9.2f}ms  {key}", flush=True)
