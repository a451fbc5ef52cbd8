"""Device-attributed budget of the EVAL forward at the MegaDepth protocol
geometry (832², batch 1) — the eval analogue of trace_step.py. Run AFTER
bench_eval_throughput.py so the graph is in the compile cache."""
import sys; sys.path.insert(0, "/root/repo")
import jax, numpy as np, jax.numpy as jnp, glob, gzip, json, collections, os
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from __graft_entry__ import _flagship_cfg
from casmtr_tpu.models.casmtr import CasMTR

w = h = 832
cfg = _flagship_cfg(train_size=704)
model = CasMTR(cfg.loftr)
rng = np.random.default_rng(0)
batch = {"image0": jnp.asarray(rng.random((1, h, w, 3)), jnp.float32),
         "image1": jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)}
variables = jax.jit(lambda r: model.init(r, batch, train=False))(
    jax.random.PRNGKey(0))

@jax.jit
def fwd(v, b):
    out = model.apply(v, b, train=False)
    fm = out.final_matches
    return fm.mconf.sum() + fm.mkpts0.sum()

r = fwd(variables, batch)
print("warm fetch", float(r), flush=True)
with jax.profiler.trace("/tmp/jtrace_eval"):
    r = fwd(variables, batch)
    _ = float(r)
d = sorted(glob.glob('/tmp/jtrace_eval/plugins/profile/*'))[-1]
tr = json.load(gzip.open(glob.glob(d + '/*.trace.json.gz')[0]))
ev = [e for e in tr.get("traceEvents", []) if e.get("ph") == "X"]
rows = []
for e in ev:
    n = e.get("name", "?")
    if n.startswith("$") or "block_until" in n:
        continue
    src = str((e.get("args") or {}).get("tf_op") or "")[:95]
    rows.append((e.get("dur", 0), n, src))
agg = collections.defaultdict(float)
for dur, n, src in rows:
    key = src if src else n.split(".")[0]
    agg[key] += dur
print("TOTAL device-attributed ms:", sum(agg.values()) / 1000, flush=True)
for key, dur in sorted(agg.items(), key=lambda x: -x[1])[:40]:
    print(f"{dur/1000:9.2f}ms  {key}", flush=True)
