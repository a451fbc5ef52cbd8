"""bf16 compute policy for the coarse/cascade transformer stacks
(CASMTR_TRANSFORMER_BF16 / TPU default; models/transformer.py
``transformer_dtype``).

Mirrors tests/test_backbone_bf16.py: the reference runs these modules under
fp16 autocast (test.py:74), the TPU build computes in bf16 with f32
params/softmaxes and casts back to f32 at the stack boundary so the matching
heads (f32 per the precision invariant) see an unchanged interface.

The default is MODE-DEPENDENT (measured on device, docs/evidence_r5):
bf16 in eval (no backward — pure fwd win), f32 in train (the bf16
backward's convert glue costs more than the matmul saving at these
shapes).  The env var forces either dtype in both modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casmtr_tpu.config import CoarseConfig
from casmtr_tpu.models.transformer import (
    LocalFeatureTransformer, transformer_dtype)


def _cfg(block_type="quadtree", **kw):
    base = dict(d_model=32, nhead=4, layer_names=["self", "cross"],
                block_type=block_type, attn_type="B", topks=[8, 8, 8],
                attention="linear")
    base.update(kw)
    return CoarseConfig(**base)


@pytest.mark.parametrize("block_type", ["quadtree", "loftr"])
def test_bf16_transformer_matches_f32(monkeypatch, block_type):
    rng = np.random.default_rng(0)
    h = w = 16
    f0 = jnp.asarray(rng.standard_normal((1, h * w, 32)), jnp.float32)
    f1 = jnp.asarray(rng.standard_normal((1, h * w, 32)), jnp.float32)
    model = LocalFeatureTransformer(_cfg(block_type), train_size=128,
                                    remat=False)

    monkeypatch.setenv("CASMTR_TRANSFORMER_BF16", "0")
    assert transformer_dtype() == jnp.float32
    variables = model.init(jax.random.PRNGKey(0), f0, f1, (h, w), (h, w))
    a0, a1 = model.apply(variables, f0, f1, (h, w), (h, w))

    monkeypatch.setenv("CASMTR_TRANSFORMER_BF16", "1")
    assert transformer_dtype() == jnp.bfloat16
    b0, b1 = model.apply(variables, f0, f1, (h, w), (h, w))

    for a, b in zip((a0, a1), (b0, b1)):
        assert a.dtype == jnp.float32 and b.dtype == jnp.float32
        ref = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(a - b))) / ref
        assert err < 6e-2, err

    # param tree identical under bf16 init (converter is dtype-agnostic)
    variables_bf = model.init(jax.random.PRNGKey(0), f0, f1, (h, w), (h, w))
    sa = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype),
                                variables["params"])
    sb = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype),
                                variables_bf["params"])
    assert sa == sb
    for leaf in jax.tree_util.tree_leaves(variables_bf["params"]):
        assert leaf.dtype == jnp.float32


def test_transformer_dtype_mode_dependent_default(monkeypatch):
    """Without the env override the policy is per-mode: f32 in train, and
    platform-dependent (bf16 only on TPU) in eval.  CPU tests therefore see
    f32 either way; the env var forces both modes."""
    monkeypatch.delenv("CASMTR_TRANSFORMER_BF16", raising=False)
    assert transformer_dtype(train=True) == jnp.float32
    expected_eval = (jnp.bfloat16 if jax.devices()[0].platform == "tpu"
                     else jnp.float32)
    assert transformer_dtype(train=False) == expected_eval
    monkeypatch.setenv("CASMTR_TRANSFORMER_BF16", "1")
    assert transformer_dtype(train=True) == jnp.bfloat16
    assert transformer_dtype(train=False) == jnp.bfloat16
    monkeypatch.setenv("CASMTR_TRANSFORMER_BF16", "0")
    assert transformer_dtype(train=True) == jnp.float32
    assert transformer_dtype(train=False) == jnp.float32


def test_bf16_transformer_gradients_finite(monkeypatch):
    monkeypatch.setenv("CASMTR_TRANSFORMER_BF16", "1")
    rng = np.random.default_rng(1)
    h = w = 16
    f0 = jnp.asarray(rng.standard_normal((1, h * w, 32)), jnp.float32)
    f1 = jnp.asarray(rng.standard_normal((1, h * w, 32)), jnp.float32)
    model = LocalFeatureTransformer(_cfg("quadtree"), train_size=128,
                                    remat=False)
    variables = model.init(jax.random.PRNGKey(0), f0, f1, (h, w), (h, w))

    def loss_fn(params):
        o0, o1 = model.apply({"params": params}, f0, f1, (h, w), (h, w))
        return jnp.sum(o0 ** 2) + jnp.sum(o1 ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(grads):
        assert leaf.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(leaf)))
        total += float(jnp.sum(jnp.abs(leaf)))
    assert total > 0.0
