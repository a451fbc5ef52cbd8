"""Benchmark: full CasMTR-4c training step (supervision + forward + backward +
optimizer update) at 704x704, batch 1, on one chip.

Baseline: the reference's inline measurement of its training step under the
same geometry — 1.19 s/step (704x704, batch 1/GPU, fp16; reference
cuda_imp/QuadTreeAttention/QuadtreeAttention/modules/
quadtree_attention_smart.py:168). vs_baseline = baseline_seconds / ours.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import argparse
import functools
import json
import os
import time

import jax

# persistent compilation cache: the 704^2 train-step graph takes ~30 min to
# compile through the axon remote-compile tunnel; cache it across runs.
# min_compile_time 0: persist EVERY graph — the relay charges a compile RPC
# even for trivial graphs, and sub-threshold graphs were re-RPC'd by every
# fresh process (327 misses per bench run measured 2026-08-20)
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

BASELINE_S_PER_STEP = 1.19


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=704)
    # 10 iters per chained-scan call: the single scalar fetch that ends a
    # measurement costs ~26-29 ms through the relay, so at 5 iters it
    # inflated the reported s/step by ~1.7% (0.3385 steady vs 0.3426-0.3459
    # in bare fresh-process runs); 10 halves that and matches the chain
    # scripts' --iters 10 graphs (same scan length -> same compile cache key)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--backbone", choices=["twins", "resnet"], default="twins",
                   help="twins = the released outdoor 4c recipe (headline); "
                        "resnet = lighter comparison variant")
    p.add_argument("--batch", type=int, default=1,
                   help="pairs per step (throughput scaling; metric name "
                        "gains a _b{N} suffix for N>1)")
    p.add_argument("--remat", action="store_true",
                   help="enable per-layer rematerialization (needed for "
                        "--batch >1 at 704^2: remat-off activations OOM the "
                        "16 GB HBM; ~15%% slower per pair at batch 1)")
    p.add_argument("--recipe", default=None,
                   help="bench a named model recipe instead of the flagship; "
                        "--backbone is ignored when set. NOTE the published "
                        "indoor_casmtr_4c recipe is internally inconsistent "
                        "(196 vs 128 dims) and crashes in the reference and "
                        "here alike — it is consumed by the PMT refine model "
                        "(cli/train.py --refine), not a plain forward")
    args = p.parse_args()

    from __graft_entry__ import _flagship_cfg
    from casmtr_tpu.models import build_model
    from casmtr_tpu.train.train_step import init_train_state, make_train_step

    size = args.size
    if args.recipe:
        from casmtr_tpu.configs import build_config
        cfg = build_config(args.recipe,
                           overrides={"loftr": {"train_size": size}})
    else:
        cfg = _flagship_cfg(train_size=size, backbone=args.backbone)
    # remat off: at batch 1 / 704^2 the bf16 fused-gather activations fit in
    # HBM, and skipping the recompute is ~15% faster (0.74 vs 0.86 s/step)
    from casmtr_tpu.config import override
    cfg = override(cfg, {"loftr": {"remat": bool(args.remat)}})
    # factory: CasMTR for cascade recipes, QuadtreeLoFTR for the baseline
    model = build_model(cfg.loftr)

    rng = np.random.default_rng(0)
    B = args.batch
    batch = {
        "image0": jnp.asarray(rng.random((B, size, size, 3)), jnp.float32),
        "image1": jnp.asarray(rng.random((B, size, size, 3)), jnp.float32),
        "depth0": jnp.ones((B, size, size), jnp.float32),
        "depth1": jnp.ones((B, size, size), jnp.float32),
        "K0": jnp.asarray(np.tile(np.array(
            [[100.0, 0, size / 2], [0, 100.0, size / 2], [0, 0, 1]],
            np.float32), (B, 1, 1))),
        "K1": jnp.asarray(np.tile(np.array(
            [[100.0, 0, size / 2], [0, 100.0, size / 2], [0, 0, 1]],
            np.float32), (B, 1, 1))),
        "T_0to1": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))),
        "T_1to0": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))),
    }

    state, tx = init_train_state(model, cfg, batch, jax.random.PRNGKey(0),
                                 steps_per_epoch=1000, base_lr=1e-3)
    step = make_train_step(model, cfg, tx)

    # chain the steps INSIDE one jit and fetch one scalar at the end: the
    # per-call host round trip would otherwise dominate, and async dispatch
    # makes block_until_ready unreliable for timing on relayed backends
    def many_steps(state, batch, n):
        def body(s, _):
            s2, scalars = step(s, batch)
            return s2, scalars["loss"]
        return jax.lax.scan(body, state, None, length=n)

    run = jax.jit(functools.partial(many_steps, n=args.iters))
    # warm with the SAME compiled function (timing the first call would
    # include the multi-minute remote compile)
    state2, losses = run(state, batch)
    _ = float(losses[-1])

    t0 = time.perf_counter()
    state2, losses = run(state, batch)
    _ = float(losses[-1])
    dt = (time.perf_counter() - t0) / args.iters

    if args.recipe:
        metric = f"{args.recipe}_train_step_{size}"
    else:
        metric = ("casmtr4c_twins_train_step_704" if args.backbone == "twins"
                  else "casmtr4c_train_step_704")
    if B > 1:
        metric += f"_b{B}"
    if args.remat:
        metric += "_remat"
    print(json.dumps({
        "metric": metric,
        "value": round(dt, 4),
        "unit": "s/step",
        # per-pair comparison: the reference baseline is per 1-pair step
        "vs_baseline": round(BASELINE_S_PER_STEP / (dt / B), 2),
    }))


if __name__ == "__main__":
    main()
