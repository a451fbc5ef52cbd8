"""bf16 backbone compute policy (CASMTR_BACKBONE_BF16 / TPU default).

The reference runs its whole forward under fp16 autocast in training
(lightning AMP) and eval (test.py:74); the TPU build's backbone equivalent
is bf16 compute with f32 params/stats (models/backbone/resnet_fpn.py
``backbone_dtype``).  These tests force the bf16 graph on CPU and pin:

* the public interface is unchanged: f32 outputs, identical param/batch-stat
  trees (the checkpoint converter is dtype-agnostic);
* bf16 outputs track the f32 outputs to bf16 rounding tolerance;
* gradients exist and are finite f32 for every parameter leaf.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casmtr_tpu.models.backbone.resnet_fpn import (
    ResNetFPN_8_2, backbone_dtype)
from casmtr_tpu.models.backbone.twins import TwinsFPN_8_4_2


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), tree)


@pytest.mark.parametrize("cls,kwargs", [
    (ResNetFPN_8_2, dict(initial_dim=16, block_dims=(16, 24, 32))),
    (TwinsFPN_8_4_2, dict(initial_dim=8, block_dims=(8, 16, 32),
                          model_type="small")),
])
def test_bf16_backbone_matches_f32(monkeypatch, cls, kwargs):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    model = cls(**kwargs)

    monkeypatch.setenv("CASMTR_BACKBONE_BF16", "0")
    assert backbone_dtype() == jnp.float32
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out_f32 = model.apply(variables, x, train=False)

    monkeypatch.setenv("CASMTR_BACKBONE_BF16", "1")
    assert backbone_dtype() == jnp.bfloat16
    out_bf16 = model.apply(variables, x, train=False)

    # identical interface: f32 outputs at every pyramid level
    for a, b in zip(out_f32, out_bf16):
        assert a.shape == b.shape
        assert a.dtype == jnp.float32 and b.dtype == jnp.float32
        ref = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(a - b))) / ref
        assert err < 6e-2, err

    # init under bf16 produces the SAME tree (params stay f32; the
    # checkpoint converter never sees the compute dtype)
    variables_bf = model.init(jax.random.PRNGKey(0), x, train=False)
    assert (_tree_shapes(variables_bf["params"])
            == _tree_shapes(variables["params"]))
    for leaf in jax.tree_util.tree_leaves(variables_bf["params"]):
        assert leaf.dtype == jnp.float32
    if "batch_stats" in variables:
        for leaf in jax.tree_util.tree_leaves(variables_bf["batch_stats"]):
            assert leaf.dtype == jnp.float32


def test_bf16_backbone_gradients_finite(monkeypatch):
    monkeypatch.setenv("CASMTR_BACKBONE_BF16", "1")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    model = ResNetFPN_8_2(initial_dim=8, block_dims=(8, 12, 16))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss_fn(params):
        outs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    grads = jax.grad(loss_fn)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(grads):
        assert leaf.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # at least one grad is nonzero (the cast chain did not sever autodiff)
    total = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert total > 0.0
