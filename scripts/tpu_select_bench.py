"""Split-top-k SELECTION variants on device (the r4 eval-batching culprit).

Two parts:
  A. lax.approx_max_k rate vs row WIDTH at fixed element count — the r4
     dense-selection regression was trace-attributed to wide rows (46.5 ms
     at [21.6k, 2704] k=32, ~5 GB/s).  This sweep locates the knee so
     dense2's CASMTR_SELECT_CHUNK can sit below it.
  B. the three selection realizations (_gather_masked_select /
     _dense_masked_select wide / _dense_masked_select chunked "dense2") at
     the real model geometries: train 704^2 level-44^2 (B=1) and eval
     832^2 level-52^2 (B=1 and B=4), K_prev=16 topk=8 plus the K_prev=32
     topk=32 eval-ish variant from the r4 trace.

Chained-scan timing (relay-safe, CLAUDE.md): N iterations inside one jit,
each depending on the previous carry, one scalar fetch.

  nohup python scripts/tpu_select_bench.py > /tmp/select_bench.log 2>&1 &
"""

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

from casmtr_tpu.ops.quadtree import (_dense_masked_select,
                                     _gather_masked_select)

ITERS = 30


def timed_scan(fn, *args, iters=ITERS, perturb=0):
    """Time fn(*args) chained `iters` times inside one jit.

    `perturb` names the arg index that is bumped by a data-dependent 0 each
    iteration so nothing hoists (must be an int array)."""

    @jax.jit
    def chain(*args):
        def body(carry, _):
            a = list(args)
            a[perturb] = carry
            outs = fn(*a)
            flat = jax.tree_util.tree_leaves(outs)
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in flat)
            bump = (s > 1e30).astype(args[perturb].dtype)
            return args[perturb] + bump, s
        _, sums = jax.lax.scan(body, args[perturb], None, length=iters)
        return jnp.sum(sums)

    r = chain(*args)
    float(r)                                   # compile + warm
    t0 = time.perf_counter()
    float(chain(*args))
    dt = time.perf_counter() - t0
    return (dt - 0.0275) / iters * 1e3         # ms/iter, relay fetch removed


def part_a():
    print("== A. approx_max_k rate vs width (fixed ~58.5M f32 elements) ==",
          flush=True)
    rng = np.random.default_rng(0)
    total = 21632 * 2704
    for W in (128, 256, 512, 676, 1024, 1352, 2704):
        R = total // W
        x = jnp.asarray(rng.standard_normal((R, W)), jnp.float32)
        k = min(32, W)

        def f(x):
            v, i = jax.lax.approx_max_k(x, k, recall_target=1.0)
            return v, i

        # perturb by adding a data-dependent zero to x itself
        @jax.jit
        def chain(x):
            def body(carry, _):
                v, i = jax.lax.approx_max_k(carry, k, recall_target=1.0)
                s = jnp.sum(v) + jnp.sum(i)
                return carry + (s > 1e30).astype(carry.dtype), s
            _, sums = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(sums)

        float(chain(x))
        t0 = time.perf_counter()
        float(chain(x))
        ms = (time.perf_counter() - t0 - 0.0275) / ITERS * 1e3
        gbs = total * 4 / ms / 1e6
        print(f"  W={W:5d} R={R:6d} k={k:2d}: {ms:7.2f} ms  {gbs:7.1f} GB/s",
              flush=True)


def sel_case(name, B, H, D, hw, K_prev, topk, seed=0):
    h, w = hw
    Lq = h * w
    P = Lq // 4
    Lb = (h // 2) * (w // 2)
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.bfloat16)
    ids = rng.integers(0, Lb, (B, P, K_prev, H)).astype(np.int32)
    ids = jnp.asarray(ids)
    print(f"-- {name}: B={B} hw={hw} K_prev={K_prev} topk={topk} "
          f"(rows={B*Lq*H}, dense_W={4*Lb}, gather_W={4*K_prev})",
          flush=True)
    import os
    os.environ["CASMTR_SELECT_ONEHOT"] = "0"
    ms = timed_scan(lambda ii, qq, kk: _gather_masked_select(
        qq, kk, ii, topk, hw, hw), ids, q, k)
    print(f"   gather       : {ms:7.2f} ms", flush=True)
    os.environ["CASMTR_SELECT_ONEHOT"] = "1"
    ms = timed_scan(lambda ii, qq, kk: _gather_masked_select(
        qq, kk, ii, topk, hw, hw), ids, q, k)
    print(f"   onehot       : {ms:7.2f} ms", flush=True)
    ms = timed_scan(lambda ii, qq, kk: _dense_masked_select(
        qq, kk, ii, topk, hw, hw, chunk=None), ids, q, k)
    print(f"   dense (wide) : {ms:7.2f} ms", flush=True)
    for chunk in (256, 512, 1024):
        ms = timed_scan(lambda ii, qq, kk, c=chunk: _dense_masked_select(
            qq, kk, ii, topk, hw, hw, chunk=c), ids, q, k)
        print(f"   dense2 c={chunk:4d}: {ms:7.2f} ms", flush=True)


def part_b():
    print("== B. selection variants at model geometries ==", flush=True)
    sel_case("train44 B1", 1, 8, 32, (44, 44), 16, 8)
    sel_case("guided22 B1", 1, 8, 32, (22, 22), 16, 16)
    sel_case("eval52 B1", 1, 8, 32, (52, 52), 16, 8)
    sel_case("eval52 B4", 4, 8, 32, (52, 52), 16, 8)
    sel_case("eval52w B1 (r4 trace shape)", 1, 8, 32, (52, 52), 32, 32)
    sel_case("eval52w B4", 4, 8, 32, (52, 52), 32, 32)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    part_a()
    part_b()
    print("DONE", flush=True)
