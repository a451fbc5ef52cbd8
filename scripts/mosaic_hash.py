"""Is the Mosaic (pallas TPU) custom-call payload deterministic across
processes?  Lowers the masked-flash kernel with interpret=False for the tpu
platform (no device needed) and hashes the canonicalized module — the same
bytes the compilation-cache key hashes.  Run twice; also try different
PYTHONHASHSEED values.

  PYTHONHASHSEED=1 python scripts/mosaic_hash.py
  PYTHONHASHSEED=2 python scripts/mosaic_hash.py
"""

import hashlib
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from casmtr_tpu.ops.pallas.quadtree_kernels import masked_fine_level


def main():
    rng = np.random.default_rng(0)
    B, H, D, h, w, K = 1, 2, 32, 16, 16, 4
    Lq = h * w
    q = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Lq, H, D)), jnp.float32)
    ids = jnp.asarray(
        rng.integers(0, (h // 2) * (w // 2), (B, Lq // 4, K, H)), jnp.int32)

    def f(q, k, v, ids):
        msg, _, _ = masked_fine_level(q, k, v, ids, (h, w), (h, w), topk=0,
                                      interpret=False)
        return msg.sum()

    lowered = jax.jit(f).trace(q, k, v, ids).lower(
        lowering_platforms=("tpu",))
    mod = lowered.compiler_ir("stablehlo")
    from jax._src import cache_key as ck
    canon = ck._canonicalize_ir(mod, ck.IgnoreCallbacks.NO)
    print("fwd canonicalized sha256:",
          hashlib.sha256(canon).hexdigest(), flush=True)

    def g(q, k, v, ids):
        return jax.grad(f)(q, k, v, ids).sum()

    lowered = jax.jit(g).trace(q, k, v, ids).lower(
        lowering_platforms=("tpu",))
    canon = ck._canonicalize_ir(lowered.compiler_ir("stablehlo"),
                                ck.IgnoreCallbacks.NO)
    print("fwd+bwd canonicalized sha256:",
          hashlib.sha256(canon).hexdigest(), flush=True)


if __name__ == "__main__":
    main()
