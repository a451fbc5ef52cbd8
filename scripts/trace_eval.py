"""Profile the eval forward (MegaDepth-1500 geometry) on device and print
the per-source device-time aggregation — the tool for the batched-eval
scaling question (pairs/s DROPS from b=1 to b=4; which op scales
superlinearly?).

  python scripts/trace_eval.py [--batch 4] [--size 832]
"""

import sys

sys.path.insert(0, "/root/repo")

import argparse
import collections
import glob
import gzip
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=832)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--backbone", default="twins")
    args = p.parse_args()

    from __graft_entry__ import _flagship_cfg
    from casmtr_tpu.models.casmtr import CasMTR

    size = args.size
    cfg = _flagship_cfg(train_size=704, backbone=args.backbone)
    model = CasMTR(cfg.loftr)
    rng = np.random.default_rng(0)
    B = args.batch
    batch = {
        "image0": jnp.asarray(rng.random((B, size, size, 3)), jnp.float32),
        "image1": jnp.asarray(rng.random((B, size, size, 3)), jnp.float32),
    }
    variables = jax.jit(
        lambda r: model.init(r, batch, train=False)
    )(jax.random.PRNGKey(0))  # one compile RPC, not ~300 eager ones

    @jax.jit
    def fwd(v, b):
        out = model.apply(v, b, train=False)
        fm = out.final_matches
        return fm.mconf.sum() + fm.mkpts0.sum()

    r = float(fwd(variables, batch))
    print("warm", r, flush=True)
    tdir = f"/tmp/jtrace_eval_b{B}"
    with jax.profiler.trace(tdir):
        _ = float(fwd(variables, batch))
    d = sorted(glob.glob(tdir + "/plugins/profile/*"))[-1]
    tr = json.load(gzip.open(glob.glob(d + "/*.trace.json.gz")[0]))
    ev = [e for e in tr.get("traceEvents", []) if e.get("ph") == "X"]
    agg = collections.defaultdict(float)
    for e in ev:
        n = e.get("name", "?")
        if n.startswith("$") or "block_until" in n:
            continue
        src = str((e.get("args") or {}).get("tf_op") or "")[:95]
        agg[src if src else n.split(".")[0]] += e.get("dur", 0)
    print(f"TOTAL device-attributed ms (b={B}):",
          sum(agg.values()) / 1000, flush=True)
    for key, dur in sorted(agg.items(), key=lambda x: -x[1])[:40]:
        print(f"{dur/1000:9.2f}ms  {key}", flush=True)


if __name__ == "__main__":
    main()
