"""Determinism check for the bench train-step graph WITHOUT a device:
lower the exact bench.py computation for the tpu platform, serialize the
StableHLO the same way the compilation-cache key does, and print its hash.
Run twice (separate processes); differing hashes reproduce the axon
cross-process cache miss locally and `--dump f.mlir` lets you diff the text.

  python scripts/lower_hash.py [--dump /tmp/a.mlir] [--size 192]
"""

import argparse
import functools
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", default=None)
    ap.add_argument("--size", type=int, default=192,
                    help="small default: lowering is platform-faithful at "
                         "any size and 704 takes minutes to trace")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from casmtr_tpu.models.casmtr import CasMTR
    from casmtr_tpu.train.train_step import init_train_state, make_train_step
    from casmtr_tpu.config import override

    size = args.size
    cfg = _flagship_cfg(train_size=size)
    cfg = override(cfg, {"loftr": {"remat": False}})
    model = CasMTR(cfg.loftr)
    rng = np.random.default_rng(0)
    B = 1
    K = jnp.asarray(np.tile(np.array(
        [[100.0, 0, size / 2], [0, 100.0, size / 2], [0, 0, 1]],
        np.float32), (B, 1, 1)))
    T = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    batch = {"image0": jnp.asarray(rng.random((B, size, size, 3)),
                                   jnp.float32),
             "image1": jnp.asarray(rng.random((B, size, size, 3)),
                                   jnp.float32),
             "depth0": jnp.ones((B, size, size), jnp.float32),
             "depth1": jnp.ones((B, size, size), jnp.float32),
             "K0": K, "K1": K, "T_0to1": T, "T_1to0": T}
    state, tx = init_train_state(model, cfg, batch, jax.random.PRNGKey(0),
                                 steps_per_epoch=1000, base_lr=1e-3)
    step = make_train_step(model, cfg, tx)

    def many_steps(state, batch, n):
        def body(s, _):
            s2, scalars = step(s, batch)
            return s2, scalars["loss"]
        return jax.lax.scan(body, state, None, length=n)

    run = jax.jit(functools.partial(many_steps, n=args.iters))
    lowered = run.trace(state, batch).lower(lowering_platforms=("tpu",))
    mod = lowered.compiler_ir("stablehlo")

    # serialize the same way jax._src.cache_key does
    from jax._src import cache_key as ck
    import io
    buf = io.BytesIO()
    mod.operation.write_bytecode(file=buf)
    by = buf.getvalue()
    print("bytecode sha256:", hashlib.sha256(by).hexdigest(), flush=True)
    canon = ck._canonicalize_ir(mod, ck.IgnoreCallbacks.NO)
    print("cache-key canonicalized sha256:",
          hashlib.sha256(canon).hexdigest(), flush=True)
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(mod.operation.get_asm(large_elements_limit=64))
        print("dumped", args.dump, flush=True)


if __name__ == "__main__":
    main()
