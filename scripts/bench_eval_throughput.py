"""Matched pairs/s/chip at the MegaDepth eval protocol (BASELINE.md north
star): CasMTR-4c forward-only at 832x832 (the test protocol pads the long
edge 832 to a square divisible by 64), batch 1, one chip.

Chains N forwards inside one jit (relay-safe timing; see CLAUDE.md) and
prints one JSON line. Run AFTER bench.py so the compile cache is warm for
the model code under test.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=832)
    p.add_argument("--height", type=int, default=None,
                   help="non-square height (e.g. 480 for the ScanNet "
                        "640x480 indoor protocol); --size is the width")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--backbone", choices=["twins", "resnet"],
                   default="twins")
    p.add_argument("--batch", type=int, default=1,
                   help="pairs per forward (serving throughput scaling; "
                        "metric name gains a _b{N} suffix for N>1)")
    args = p.parse_args()

    from __graft_entry__ import _flagship_cfg
    from casmtr_tpu.models.casmtr import CasMTR

    w = args.size
    h = args.height or args.size
    cfg = _flagship_cfg(train_size=704, backbone=args.backbone)
    model = CasMTR(cfg.loftr)
    rng = np.random.default_rng(0)
    B = args.batch
    batch = {
        "image0": jnp.asarray(rng.random((B, h, w, 3)), jnp.float32),
        "image1": jnp.asarray(rng.random((B, h, w, 3)), jnp.float32),
    }
    variables = jax.jit(
        lambda r: model.init(r, batch, train=False)
    )(jax.random.PRNGKey(0))  # one compile RPC, not ~300 eager ones

    def fwd(v, b):
        out = model.apply(v, b, train=False)
        fm = out.final_matches
        return fm.mconf.sum() + fm.mkpts0.sum()

    def chain(v, img0, img1, n):
        def body(c, _):
            r = fwd(v, {"image0": img0 + 1e-12 * c, "image1": img1})
            return c + 1e-12 * r, ()
        return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]

    run = jax.jit(functools.partial(chain, n=args.iters))
    r = float(run(variables, batch["image0"], batch["image1"]))  # compile+warm
    t0 = time.perf_counter()
    r = float(run(variables, batch["image0"], batch["image1"]))
    dt = (time.perf_counter() - t0) / args.iters

    geo = f"{w}" if h == w else f"{w}x{h}"
    metric = f"casmtr4c_{args.backbone}_eval_pairs_per_s_{geo}"
    if B > 1:
        metric += f"_b{B}"
    print(json.dumps({
        "metric": metric,
        "value": round(B / dt, 3),
        "unit": "pairs/s/chip",
        "s_per_pair": round(dt / B, 4),
    }))


if __name__ == "__main__":
    main()
