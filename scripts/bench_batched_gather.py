"""Batched block_gather lowering experiment (the eval-throughput b4
regression: trace_eval shows gather time scaling 6.4x from b=1 to b=4 —
1.6x per-descriptor slowdown; pallas/matmul scale linearly).

Hypothesis: XLA lowers the batch-dim take_along_axis worse than the same
gather with batch FOLDED into the row axis (one table of B*Lb rows, indices
offset by b*Lb — identical descriptor count, B=1-shaped operand).

Chains iterations inside one jit (relay-safe timing, CLAUDE.md); every
iteration's indices depend on the previous result so nothing hoists.

  python scripts/bench_batched_gather.py [--iters 30]
"""

import argparse
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

from casmtr_tpu.ops.quadtree import block_gather


def folded_block_gather(table, parent_idx, n_children):
    """block_gather with the batch folded into the gather axis."""
    B, Lb, H, FD = table.shape
    P, K = parent_idx.shape[1], parent_idx.shape[2]
    t2 = table.reshape(1, B * Lb, H, FD)
    off = (jnp.arange(B, dtype=jnp.int32) * Lb)[:, None, None, None]
    i2 = (parent_idx + off).reshape(1, B * P, K, parent_idx.shape[3])
    out = block_gather(t2, i2, n_children=n_children)
    return out.reshape(B, P, K, *out.shape[3:])


def timed(fn, table, idx, iters, label):
    @jax.jit
    def chain(table, idx):
        def body(carry, _):
            out = fn(table, carry)
            # feed the result back into the next indices (defeats hoisting)
            bump = (jnp.sum(out[..., :1, :1]) > 1e30).astype(jnp.int32)
            return (carry + bump) % table.shape[1], jnp.sum(out)
        _, sums = jax.lax.scan(body, idx, None, length=iters)
        return jnp.sum(sums)

    r = chain(table, idx)
    float(r)  # warm + compile
    t0 = time.perf_counter()
    r = chain(table, idx)
    v = float(r)
    dt = time.perf_counter() - t0 - 0.028  # relay fetch round trip
    per = dt / iters * 1000
    print(f"{label}: {per:.3f} ms/gather  (checksum {v:.3e})", flush=True)
    return per


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--lb", type=int, default=2704)   # 832^2 eval, 1/8 level
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--d", type=int, default=32)
    a = p.parse_args()
    rng = np.random.default_rng(0)
    results = {}
    for B in (1, 4):
        P = a.lb  # one parent per block at the next level
        table = jnp.asarray(
            rng.standard_normal((B, a.lb, a.heads, 8 * a.d)), jnp.bfloat16)
        idx = jnp.asarray(
            rng.integers(0, a.lb, (B, P, a.k, a.heads)), jnp.int32)
        results[f"batched_b{B}"] = timed(
            lambda t, i: block_gather(t, i, 8), table, idx, a.iters,
            f"batched   B={B}")
        results[f"folded_b{B}"] = timed(
            lambda t, i: folded_block_gather(t, i, 8), table, idx, a.iters,
            f"folded    B={B}")
        # parity
        o1 = np.asarray(block_gather(table, idx, 8), np.float32)
        o2 = np.asarray(folded_block_gather(table, idx, 8), np.float32)
        np.testing.assert_allclose(o1, o2)
        print(f"parity ok B={B}", flush=True)
    import json
    print(json.dumps({"metric": "batched_gather_ms", **results}))


if __name__ == "__main__":
    main()
