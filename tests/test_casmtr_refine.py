"""Tests for the PMT-refine (frozen trunk + ladder) model."""

import numpy as np
import jax
import jax.numpy as jnp

from casmtr_tpu.config import override
from casmtr_tpu.models.casmtr_refine import CasMTRRefine, frozen_param_label
from tests.test_casmtr_model import tiny_casmtr_cfg


def tiny_refine_cfg():
    cfg = tiny_casmtr_cfg((4,))
    return override(cfg, {
        "backbone": {"refine_dims": [6, 12, 16], "initial_dim": 8,
                     "block_dims": [8, 12, 16]},
        "is_rgb": True,
    })


def test_refine_forward(rng):
    cfg = tiny_refine_cfg()
    model = CasMTRRefine(cfg)
    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    batch = {"image0": jnp.asarray(img), "image1": jnp.asarray(img)}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert "4c" in out.cascades
    assert out.fine is not None
    assert np.isfinite(np.asarray(out.final_matches.mkpts1)).all()
    # the cas_-prefixed fine heads exist (checkpoint-collision avoidance)
    p = variables["params"]
    assert "cas_fine_preprocess" in p and "cas_loftr_fine" in p
    assert "ladder" in p and "backbone" in p


def test_refine_trunk_gets_no_gradient(rng):
    """Backbone/coarse-transformer params must receive zero gradient."""
    cfg = tiny_refine_cfg()
    model = CasMTRRefine(cfg)
    img0 = rng.random((1, 64, 64, 3)).astype(np.float32)
    img1 = rng.random((1, 64, 64, 3)).astype(np.float32)
    batch = {"image0": jnp.asarray(img0), "image1": jnp.asarray(img1)}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            batch, train=True, mutable=["batch_stats"])
        return jnp.sum(out.cascades["4c"].conf_matrix)

    grads = jax.grad(loss_fn)(variables["params"])
    gb = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["backbone"], 0.0)
    gc = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["loftr_coarse"], 0.0)
    gl = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["ladder"], 0.0)
    assert gb == 0.0 and gc == 0.0
    assert gl > 0.0


def test_frozen_param_label():
    assert frozen_param_label((jax.tree_util.DictKey("backbone"),))
    assert frozen_param_label((jax.tree_util.DictKey("loftr_coarse"),))
    assert not frozen_param_label((jax.tree_util.DictKey("ladder"),))


def test_refine_optimizer_freezes_trunk(rng):
    """build_optimizer(frozen_label_fn) gives zero updates to the trunk and
    nonzero updates to the trainable modules (reference
    lightning_cascade_refine.py:80-99 excludes them from param_groups)."""
    import dataclasses
    from casmtr_tpu.config import TrainerConfig
    from casmtr_tpu.train.optim import build_optimizer
    import optax

    tcfg = dataclasses.replace(
        TrainerConfig(), scheduler="MultiStepLR", mslr_milestones=(),
        warmup_step=0, adamw_decay=0.0, gradient_clipping=1e9)
    params = {"backbone": {"w": jnp.zeros(3)},
              "loftr_coarse": {"w": jnp.zeros(3)},
              "ladder": {"w": jnp.zeros(3)},
              "cas_loftr_fine": {"w": jnp.zeros(3)}}
    tx = build_optimizer(tcfg, 1e-3, 100, frozen_label_fn=frozen_param_label)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates["backbone"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["loftr_coarse"]["w"]).sum()) == 0.0
    np.testing.assert_allclose(np.abs(np.asarray(updates["ladder"]["w"])),
                               1e-3, rtol=1e-4)
    np.testing.assert_allclose(
        np.abs(np.asarray(updates["cas_loftr_fine"]["w"])), 1e-3, rtol=1e-4)
