"""The quadtree-LoFTR baseline recipe end-to-end through the TRAIN step
machinery (build_model must route cascade=False to QuadtreeLoFTR — bench.py
--recipe quadtree_baseline hit CasMTR's 3-level unpack before r4)."""

import numpy as np
import jax
import jax.numpy as jnp


def test_quadtree_baseline_train_step(rng):
    from casmtr_tpu.configs import build_config
    from casmtr_tpu.models import build_model
    from casmtr_tpu.models.loftr import QuadtreeLoFTR
    from casmtr_tpu.train.train_step import init_train_state, make_train_step

    cfg = build_config("quadtree_baseline",
                       overrides={"loftr": {"train_size": 192}})
    model = build_model(cfg.loftr)
    assert isinstance(model, QuadtreeLoFTR)
    size, B = 192, 1
    K = jnp.asarray(np.tile(np.array(
        [[100.0, 0, size / 2], [0, 100.0, size / 2], [0, 0, 1]],
        np.float32), (B, 1, 1)))
    T = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    batch = {
        "image0": jnp.asarray(rng.random((B, size, size, 3)), jnp.float32),
        "image1": jnp.asarray(rng.random((B, size, size, 3)), jnp.float32),
        "depth0": jnp.ones((B, size, size), jnp.float32),
        "depth1": jnp.ones((B, size, size), jnp.float32),
        "K0": K, "K1": K, "T_0to1": T, "T_1to0": T,
    }
    state, tx = init_train_state(model, cfg, batch, jax.random.PRNGKey(0),
                                 steps_per_epoch=100, base_lr=1e-3)
    step = jax.jit(make_train_step(model, cfg, tx))
    state2, scalars = step(state, batch)
    assert np.isfinite(float(scalars["loss"]))
    assert int(state2.step) == 1
