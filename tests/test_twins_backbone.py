"""Tests for the Twins-SVT (ALTGVT) backbone + FPN."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmtr_tpu.models.backbone.twins import TwinsFPN_8_4_2, TwinsSVT


def test_twins_fpn_shapes(rng):
    model = TwinsFPN_8_4_2(initial_dim=64, block_dims=(16, 24, 32),
                           model_type="small")
    img = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img, train=False)
    outs = model.apply(params, img, train=False)
    assert outs[0].shape == (1, 8, 8, 32)     # 1/8
    assert outs[1].shape == (1, 16, 16, 24)   # 1/4
    assert outs[2].shape == (1, 32, 32, 16)   # 1/2
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_twins_svt_stage_dims(rng):
    vit = TwinsSVT(model_type="small", n_stages=2)
    img = jnp.asarray(rng.random((1, 56, 56, 3)).astype(np.float32))
    params = vit.init(jax.random.PRNGKey(0), img, train=False)
    x2, x3 = vit.apply(params, img, train=False)
    assert x2.shape == (1, 14, 14, 64)   # 1/4, embed_dims[0]
    assert x3.shape == (1, 7, 7, 128)    # 1/8, embed_dims[1]
    # param structure: alternating blocks (block 0 window, block 1 global sr)
    p = params["params"]
    assert "qkv" in p["blocks_0_0"]["attn"]          # window attention
    assert "kv" in p["blocks_0_1"]["attn"]           # global sr attention
    assert "sr" in p["blocks_0_1"]["attn"]
    assert "pos_block_0" in p


def test_twins_in_casmtr(rng):
    """Full CasMTR-4c with a small Twins backbone end-to-end."""
    from casmtr_tpu.configs import build_config
    from casmtr_tpu.models.casmtr import CasMTR
    cfg = build_config("outdoor_casmtr_4c", overrides={
        "loftr": {
            "backbone": {"model_type": "small", "initial_dim": 64,
                         "block_dims": [64, 128, 256]},
            "coarse": {"topks": [4, 4, 4],
                       "layer_names": ["self", "cross"]},
            "coarse2": {"layer_names": ["cross", "self"]},
            "match_coarse": {"max_matches": 32},
            "match_cascade": {"max_matches": [64]},
            "train_size": 64,
        },
    })
    model = CasMTR(cfg.loftr)
    img = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    batch = {"image0": img, "image1": img}
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(params, batch, train=False)
    assert np.isfinite(np.asarray(out.final_matches.mkpts0)).all()
    # the released-config cascade filter chain (thr 0.2 + NMS + pre-gates) can
    # legitimately reject everything under random weights; the coarse stage
    # on identical images must still produce mutual matches
    assert bool(out.coarse.matches.valid.any())
