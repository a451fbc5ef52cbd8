"""Standalone device bench: Twins-large FPN backbone fwd+bwd, f32 vs bf16.

Measures the backbone_dtype() lever in isolation before paying the full
train-step recompile.  Relay-honest timing: N iterations chained inside ONE
jit via lax.scan (each iteration's input depends on the previous loss so
nothing hoists), one scalar fetch per measurement.

Usage: python scripts/bench_backbone_bf16.py [--size 704] [--iters 8]
"""
import sys; sys.path.insert(0, "/root/repo")
import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from casmtr_tpu.models.backbone.twins import TwinsFPN_8_4_2


def build(size, iters):
    model = TwinsFPN_8_4_2(model_type="large")
    rng = np.random.default_rng(0)
    # B=2: the CasMTR forward stacks image0|image1 for the concat-BN trick
    x = jnp.asarray(rng.random((2, size, size, 3)), jnp.float32)

    @jax.jit
    def init():
        return model.init(jax.random.PRNGKey(0), x, train=True)

    variables = init()

    def loss_fn(params, inp):
        outs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            inp, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o * o) for o in outs)

    @jax.jit
    def chain(params, inp):
        def body(carry, _):
            l, g = jax.value_and_grad(loss_fn)(params, inp + carry * 1e-20)
            gsum = sum(jnp.sum(jnp.abs(leaf))
                       for leaf in jax.tree_util.tree_leaves(g))
            return l + gsum * 1e-20, None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return out

    return chain, variables["params"], x


def measure(tag, size, iters):
    chain, params, x = build(size, iters)
    t0 = time.time()
    v = float(chain(params, x))   # compile + run
    t1 = time.time()
    v = float(chain(params, x))   # warm
    t2 = time.time()
    v = float(chain(params, x))
    t3 = time.time()
    per = min(t2 - t1, t3 - t2) / iters
    print(f"{tag}: {per*1e3:.2f} ms/iter (fwd+bwd, B=2 {size}^2) "
          f"[compile+first {t1-t0:.1f}s] loss={v:.3e}", flush=True)
    return per


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=704)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mode", choices=["f32", "bf16", "both"], default="both")
    args = ap.parse_args()

    results = {}
    if args.mode in ("f32", "both"):
        os.environ["CASMTR_BACKBONE_BF16"] = "0"
        results["f32"] = measure("f32 ", args.size, args.iters)
    if args.mode in ("bf16", "both"):
        os.environ["CASMTR_BACKBONE_BF16"] = "1"
        results["bf16"] = measure("bf16", args.size, args.iters)
    if len(results) == 2:
        print(f"speedup: {results['f32']/results['bf16']:.2f}x "
              f"({(results['f32']-results['bf16'])*1e3:.1f} ms saved/step)",
              flush=True)
