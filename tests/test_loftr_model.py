"""End-to-end test of the plain QuadtreeLoFTR slice on tiny synthetic inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmtr_tpu.configs import build_config
from casmtr_tpu.models.loftr import QuadtreeLoFTR


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = build_config("quadtree_baseline", overrides={
        "loftr": {
            "backbone": {"initial_dim": 8, "block_dims": [8, 12, 16]},
            "coarse": {"d_model": 16, "nhead": 2, "topks": [4, 4, 4],
                       "layer_names": ["self", "cross"]},
            "fine": {"d_model": 8, "nhead": 2, "layer_names": ["self", "cross"]},
            "match_coarse": {"max_matches": 32, "thr": 0.0},
            "train_size": 64,
        },
    })
    return cfg.loftr


def test_loftr_forward_shapes(tiny_cfg, rng):
    model = QuadtreeLoFTR(tiny_cfg)
    img = rng.random((1, 64, 64, 1)).astype(np.float32)
    batch = {"image0": jnp.asarray(img), "image1": jnp.asarray(img)}
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(params, batch, train=False)

    L = (64 // 8) ** 2
    assert out.coarse.conf_matrix.shape == (1, L, L)
    assert out.final_matches.mkpts0.shape == (32, 2)
    assert out.fine.expec_f.shape == (32, 3)
    assert bool(out.final_matches.valid.any())

    # identical images with threshold 0 -> diagonal self-matches dominate
    m = out.final_matches
    v = np.asarray(m.valid)
    same = (np.asarray(m.i_ids)[v] == np.asarray(m.j_ids)[v]).mean()
    assert same > 0.9


def test_loftr_forward_jits(tiny_cfg, rng):
    model = QuadtreeLoFTR(tiny_cfg)
    img0 = rng.random((1, 64, 64, 1)).astype(np.float32)
    img1 = rng.random((1, 64, 64, 1)).astype(np.float32)
    batch = {"image0": jnp.asarray(img0), "image1": jnp.asarray(img1)}
    params = model.init(jax.random.PRNGKey(0), batch, train=False)

    fwd = jax.jit(lambda p, b: model.apply(p, b, train=False))
    out = fwd(params, batch)
    assert np.isfinite(np.asarray(out.coarse.conf_matrix)).all()
    # conf matrix rows x cols are products of two softmaxes -> sum <= 1
    s = np.asarray(out.coarse.conf_matrix.sum(axis=2))
    assert (s <= 1.0 + 1e-4).all()


def test_loftr_with_padding_masks(tiny_cfg, rng):
    model = QuadtreeLoFTR(tiny_cfg)
    img = rng.random((1, 64, 64, 1)).astype(np.float32)
    img_pad = img.copy()
    img_pad[:, 48:] = 0.0  # bottom padding
    mask = np.ones((1, 64, 64), np.float32)
    mask[:, 48:] = 0.0
    batch = {"image0": jnp.asarray(img_pad), "image1": jnp.asarray(img_pad),
             "mask0": jnp.asarray(mask), "mask1": jnp.asarray(mask)}
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(params, batch, train=False)
    m = out.final_matches
    v = np.asarray(m.valid)
    # no match may land in the padded region (rows >= 48/8 = 6)
    rows0 = np.asarray(m.i_ids)[v] // 8
    rows1 = np.asarray(m.j_ids)[v] // 8
    assert (rows0 < 6).all()
    assert (rows1 < 6).all()
