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
