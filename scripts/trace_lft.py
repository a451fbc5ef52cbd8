import jax, numpy as np, jax.numpy as jnp, glob, os, gzip, json, collections, sys
from __graft_entry__ import _flagship_cfg
from casmtr_tpu.models.transformer import LocalFeatureTransformer
size = 704
cfg = _flagship_cfg(train_size=size).loftr
rng = np.random.default_rng(0)
h8 = size // 8
t80 = jnp.asarray(rng.standard_normal((1, h8*h8, 256)).astype(np.float32))
t81 = jnp.asarray(rng.standard_normal((1, h8*h8, 256)).astype(np.float32))
# train_mode=True: train-step budget attribution (dtype policy is per-mode)
lft = LocalFeatureTransformer(cfg.coarse, h8, train_mode=True)
params = lft.init(jax.random.PRNGKey(0), t80, t81, (h8,h8), (h8,h8))
f = jax.jit(lambda v,a,b: lft.apply(v, a, b, (h8,h8), (h8,h8))[0].sum())
print(float(f(params, t80, t81)), flush=True)
with jax.profiler.trace("/tmp/jtrace_lft2"):
    r = f(params, t80, t81)
    _ = float(r)
d = sorted(glob.glob('/tmp/jtrace_lft2/plugins/profile/*'))[-1]
tr = json.load(gzip.open(glob.glob(d + '/*.trace.json.gz')[0]))
ev = [e for e in tr.get("traceEvents", []) if e.get("ph") == "X"]
# dump a sample event with args to see metadata
import itertools
for e in ev:
    if "fusion" in e.get("name",""):
        print("SAMPLE:", json.dumps(e)[:600], flush=True)
        break
rows = []
for e in ev:
    n = e.get("name","?")
    if n.startswith("$") or "block_until" in n or "trace(" in n: continue
    src = (e.get("args") or {}).get("source_info") or (e.get("args") or {}).get("tf_op") or ""
    rows.append((e.get("dur",0), n, str(src)[:80]))
agg = collections.defaultdict(float)
for dur, n, src in rows:
    agg[(n.split(".")[0], src)] += dur
for (n, src), dur in sorted(agg.items(), key=lambda x:-x[1])[:25]:
    print(f"{dur/1000:9.2f}ms  {n:28s} {src}", flush=True)
