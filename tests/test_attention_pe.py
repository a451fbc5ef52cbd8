"""Tests for dense attention primitives and sinusoidal position encodings."""

import numpy as np
import jax.numpy as jnp

from casmtr_tpu.ops import attention as att
from casmtr_tpu.ops import position_encoding as pe
from casmtr_tpu.config import get_cfg_defaults, override


def test_full_attention_is_softmax_weighted_average(rng):
    B, L, S, H, D = 2, 5, 7, 2, 16
    q = rng.standard_normal((B, L, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    got = np.asarray(att.full_attention(*map(jnp.asarray, (q, k, v))))
    # numpy re-derivation
    qk = np.einsum("blhd,bshd->blsh", q, k) / np.sqrt(D)
    a = np.exp(qk - qk.max(2, keepdims=True))
    a /= a.sum(2, keepdims=True)
    want = np.einsum("blsh,bshd->blhd", a, v)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_linear_attention_normalization(rng):
    """With identical value rows, linear attention must return that row
    (it computes a normalized weighted average)."""
    B, L, S, H, D = 1, 4, 6, 2, 8
    q = rng.standard_normal((B, L, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = np.tile(rng.standard_normal((1, 1, H, D)).astype(np.float32), (B, S, 1, 1))
    out = np.asarray(att.linear_attention(*map(jnp.asarray, (q, k, v))))
    np.testing.assert_allclose(out, np.tile(v[:, :1], (1, L, 1, 1)),
                               rtol=1e-4, atol=1e-4)


def test_linear_attention_kv_mask_excludes_padding(rng):
    B, L, S, H, D = 1, 3, 8, 2, 8
    q = rng.standard_normal((B, L, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    kv_mask = np.ones((B, S), np.float32)
    kv_mask[:, 5:] = 0
    out_masked = np.asarray(att.linear_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        kv_mask=jnp.asarray(kv_mask)))
    # equivalent: physically truncate the keys/values
    out_trunc = np.asarray(att.linear_attention(
        jnp.asarray(q), jnp.asarray(k[:, :5]), jnp.asarray(v[:, :5])))
    np.testing.assert_allclose(out_masked, out_trunc, rtol=1e-4, atol=1e-4)


def test_sine_pe_norm_scale_invariance():
    """The size-renormalized PE at (h, w) must equal the PE at (2h, 2w)
    subsampled at every second position (that is its purpose:
    reference position_encoding.py:71-82)."""
    d = 32
    small = np.asarray(pe.sine_pe_norm(d, 8, 8, max_shape=(16, 16)))
    big = np.asarray(pe.sine_pe_norm(d, 16, 16, max_shape=(16, 16)))
    np.testing.assert_allclose(small, big[1::2, 1::2], rtol=1e-5, atol=1e-5)


def test_sine_pe_channel_pattern():
    d = 8
    enc = np.asarray(pe.sine_pe_norm(d, 4, 4, max_shape=(4, 4)))
    # channels 0::4 are sin(x * w0); at row 0 they vary along x only
    assert np.allclose(enc[0, :, 0], enc[3, :, 0])
    # channels 2::4 are sin(y * w0); vary along y only
    assert np.allclose(enc[:, 0, 2], enc[:, 3, 2])


def test_config_override_nested():
    cfg = get_cfg_defaults()
    cfg2 = override(cfg, {"loftr": {"coarse": {"d_model": 320}},
                          "trainer.seed": 7})
    assert cfg2.loftr.coarse.d_model == 320
    assert cfg2.trainer.seed == 7
    assert cfg.loftr.coarse.d_model == 256  # original untouched
    # lists become tuples (hashable config)
    cfg3 = override(cfg, {"loftr": {"coarse": {"topks": [1, 2, 3]}}})
    assert cfg3.loftr.coarse.topks == (1, 2, 3)


def test_config_recipes_build():
    from casmtr_tpu.configs import build_config
    cfg = build_config("outdoor_casmtr_4c", "megadepth_test_1500")
    assert cfg.loftr.backbone.backbone_type == "Twins"
    assert cfg.loftr.coarse.topks == (32, 16, 8)
    assert cfg.dataset.mgdpt_img_resize == 832
    assert cfg.trainer.epi_err_thr == 1e-4
    cfg2 = build_config("outdoor_casmtr_2c")
    assert cfg2.loftr.cascade_levels == (4, 2)
    assert cfg2.loftr.fine_concat_coarse_feat is False
    cfg3 = build_config("indoor_casmtr_4c")
    assert cfg3.loftr.coarse2.self_attn_type == "POLA"
