"""End-to-end tests of the CasMTR cascade assemblies on tiny inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmtr_tpu.configs import build_config
from casmtr_tpu.models.casmtr import CasMTR


def tiny_casmtr_cfg(levels=(4,), self_attn="local", post_method=None):
    n = len(levels)
    cfg = build_config(overrides={
        "loftr": {
            "backbone": {"backbone_type": "ResNetFPN", "initial_dim": 8,
                         "block_dims": [8, 12, 16]},
            "resolution": [8, 4, 2],
            "coarse": {"d_model": 16, "nhead": 2, "block_type": "quadtree",
                       "attn_type": "B", "topks": [4, 4, 4],
                       "layer_names": ["self", "cross"]},
            "coarse2": {"d_model": 12, "nhead": 2,
                        "layer_names": ["cross", "self", "cross"],
                        "self_attn_type": self_attn, "window_size": 3,
                        "attn_window_size": 3, "sr_ratio": 2,
                        "post_config": {"method": post_method,
                                        "window_size": 3}},
            "coarse3": {"d_model": 8, "nhead": 2,
                        "layer_names": ["cross", "self"],
                        "self_attn_type": self_attn, "window_size": 3,
                        "attn_window_size": 3, "sr_ratio": 2,
                        "post_config": {"method": post_method,
                                        "window_size": 3}},
            "fine": {"d_model": 8, "nhead": 2,
                     "layer_names": ["self", "cross"], "attention": "full"},
            "match_coarse": {"max_matches": 16, "thr": 0.0, "border_rm": 0},
            "match_cascade": {
                "thr": [0.0] * n, "pre_thr": [[0.0]] * n,
                "test_thr": [0.0] * n, "border_rm": [0] * n,
                "double_check": [False] * n, "match_type": ["softmax"] * n,
                "dsmax_temperature": [1.0] * n,
                "train_pad_num_gt_min": [16] * n, "max_matches": [32] * n,
            },
            "cascade": True,
            "cascade_levels": list(levels),
            "training_stage": 9,
            "train_size": 64,
            "fine_concat_coarse_feat": len(levels) == 1,
        },
    })
    return cfg.loftr


@pytest.mark.parametrize("levels", [(4,), (4, 2)])
def test_casmtr_forward(levels, rng):
    cfg = tiny_casmtr_cfg(levels)
    model = CasMTR(cfg)
    img0 = rng.random((1, 64, 64, 3)).astype(np.float32)
    img1 = rng.random((1, 64, 64, 3)).astype(np.float32)
    batch = {"image0": jnp.asarray(img0), "image1": jnp.asarray(img1)}
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(params, batch, train=False)

    L8 = (64 // 8) ** 2
    assert out.coarse.conf_matrix.shape == (1, L8, L8)
    assert "4c" in out.cascades
    L4 = (64 // 4) ** 2
    assert out.cascades["4c"].conf_matrix.shape[1] == L4
    if len(levels) > 1:
        assert "2c" in out.cascades
        assert out.cascades["2c"].conf_matrix.shape[1] == (64 // 2) ** 2
    assert out.fine is not None
    assert np.isfinite(np.asarray(out.fine.mkpts1_f)).all()
    assert out.final_matches.valid.shape[0] == 32


def test_casmtr_cascade_match_structure(rng):
    """Structural invariants: each match's j lies in i's candidate window, and
    with double_check enabled the matches are cycle-consistent."""
    cfg = tiny_casmtr_cfg((4,))
    from casmtr_tpu.config import override
    cfg = override(cfg, {"match_cascade": {"double_check": [True]}})
    model = CasMTR(cfg)
    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    batch = {"image0": jnp.asarray(img), "image1": jnp.asarray(img)}
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(params, batch, train=False)
    st = out.cascades["4c"]
    m = st.matches
    v = np.asarray(m.valid)
    assert v.any()
    i_ids = np.asarray(m.i_ids)[v]
    j_ids = np.asarray(m.j_ids)[v]
    cands = np.asarray(st.idx_c01)[0]          # [L0, Kw]
    assert all(j in cands[i] for i, j in zip(i_ids, j_ids))
    # cycle consistency from double_check
    back = np.asarray(st.next_idx_c10)[0]
    assert (back[j_ids] == i_ids).all()


def test_casmtr_maxpool_nms_path(rng):
    cfg = tiny_casmtr_cfg((4,), post_method="maxpool_nms")
    model = CasMTR(cfg)
    img0 = rng.random((1, 64, 64, 3)).astype(np.float32)
    img1 = rng.random((1, 64, 64, 3)).astype(np.float32)
    batch = {"image0": jnp.asarray(img0), "image1": jnp.asarray(img1)}
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(params, batch, train=False)
    assert np.isfinite(np.asarray(out.final_matches.mkpts0)).all()


def test_casmtr_pola_self_attention(rng):
    cfg = tiny_casmtr_cfg((4,), self_attn="POLA")
    model = CasMTR(cfg)
    # 64 -> 1/4 grid is 16x16, not divisible by ws=3: exercises POLA padding
    img0 = rng.random((1, 64, 64, 3)).astype(np.float32)
    img1 = rng.random((1, 64, 64, 3)).astype(np.float32)
    batch = {"image0": jnp.asarray(img0), "image1": jnp.asarray(img1)}
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(params, batch, train=False)
    assert np.isfinite(np.asarray(out.cascades["4c"].conf_matrix)).all()


def test_casmtr_train_mode_with_gt(rng):
    """Training forward: gt window labels selected for the loss."""
    cfg = tiny_casmtr_cfg((4,))
    model = CasMTR(cfg)
    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    L4 = (64 // 4) ** 2
    gt_idx = jnp.asarray(rng.integers(0, L4, (1, L4)), dtype=jnp.int32)
    gt_mask = jnp.asarray(rng.random((1, L4)) > 0.5)
    batch = {"image0": jnp.asarray(img), "image1": jnp.asarray(img),
             "gt_idx_4c": gt_idx, "gt_mask_4c": gt_mask}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, mutated = model.apply(
        variables, batch, train=True, mutable=["batch_stats"])
    st = out.cascades["4c"]
    assert st.window_gt_label is not None
    M, Kw = st.window_gt_label.shape
    assert M == 16
    # every selected (valid) match has exactly one gt label in its window
    v = np.asarray(st.matches.valid)
    sums = np.asarray(st.window_gt_label.sum(-1))[v]
    assert (sums == 1).all()


def test_build_backbone_registry():
    """Every reference resolution routes to a module (16_4 / 16_8_4_2 were
    present but unreachable before round 2)."""
    from casmtr_tpu.config import get_cfg_defaults, override
    from casmtr_tpu.models.backbone import build_backbone
    from casmtr_tpu.models.backbone.resnet_fpn import (ResNetFPN_8_2,
                                                       ResNetFPN_8_4_2,
                                                       ResNetFPN_16_4)
    from casmtr_tpu.models.backbone.twins import (TwinsFPN_8_4_2,
                                                  TwinsFPN_16_8_4_2)

    base = get_cfg_defaults().loftr
    cases = [
        ({"backbone": {"backbone_type": "ResNetFPN"},
          "resolution": [8, 2]}, ResNetFPN_8_2),
        ({"backbone": {"backbone_type": "ResNetFPN"},
          "resolution": [8, 4, 2]}, ResNetFPN_8_4_2),
        ({"backbone": {"backbone_type": "ResNetFPN",
                       "block_dims": [8, 12, 16, 24]},
          "resolution": [16, 4]}, ResNetFPN_16_4),
        ({"backbone": {"backbone_type": "Twins"},
          "resolution": [8, 4, 2]}, TwinsFPN_8_4_2),
        ({"backbone": {"backbone_type": "Twins",
                       "block_dims": [8, 12, 16, 24]},
          "resolution": [16, 8, 4, 2]}, TwinsFPN_16_8_4_2),
    ]
    for ov, cls in cases:
        cfg = override(base, ov)
        mod = build_backbone(cfg)
        assert isinstance(mod, cls), (ov, type(mod))
        assert mod.name == "backbone"


def test_cascade_windows_decode_with_target_dims(rng):
    """idx_c01 holds matches ON IMAGE1's half grid; the cross-attention
    windows must decode/clamp with image1's dims. With unequal image shapes
    a previous-stage match at image1's bottom-right corner must yield
    candidates reaching image1's last cell (decoding with image0's narrower
    width silently shifted every window)."""
    from casmtr_tpu.models.cascade_transformer import CascadeFeatureTransformer

    lcfg = tiny_casmtr_cfg(levels=(4,))
    B, C = 1, lcfg.coarse2.d_model
    H0 = W0 = 8          # this level's grid for image0
    H1, W1 = 8, 12       # image1 is wider
    t0 = jnp.asarray(rng.standard_normal((B, H0 * W0, C)), jnp.float32)
    t1 = jnp.asarray(rng.standard_normal((B, H1 * W1, C)), jnp.float32)
    # every image0 parent matched image1's bottom-right HALF-grid cell
    br = (H1 // 2) * (W1 // 2) - 1
    idx01 = jnp.full((B, (H0 // 2) * (W0 // 2)), br, jnp.int32)
    idx10 = jnp.zeros((B, (H1 // 2) * (W1 // 2)), jnp.int32)

    model = CascadeFeatureTransformer(lcfg.coarse2, train_size=64)
    variables = model.init(jax.random.PRNGKey(0), t0, t1, idx01, idx10,
                           (H0, W0), (H1, W1))
    _, _, idx01_out, idx10_out, _, _, _ = model.apply(
        variables, t0, t1, idx01, idx10, (H0, W0), (H1, W1))
    # candidates are flat indices into image1's full grid
    assert int(idx01_out.max()) == H1 * W1 - 1
    assert int(idx01_out.min()) >= 0
    # and the reverse direction stays inside image0's grid
    assert int(idx10_out.max()) < H0 * W0


@pytest.mark.parametrize("levels", [(4,), (4, 2)])
def test_casmtr_rt_rd_gates_smoke(levels, rng):
    """Full-model eval forward with the rt/rd test gates enabled (the
    reference declares POST_CONFIG.RT/RD but crashes if they are set —
    coarse_matching.py:74 leaves the second-best tensors None; this build
    completes the plumbing). Gate masks must only REMOVE matches relative to
    the ungated forward (same params, same inputs)."""
    cfg = tiny_casmtr_cfg(levels)
    model = CasMTR(cfg)
    img0 = rng.random((1, 64, 64, 3)).astype(np.float32)
    img1 = rng.random((1, 64, 64, 3)).astype(np.float32)
    batch = {"image0": jnp.asarray(img0), "image1": jnp.asarray(img1)}
    params = model.init(jax.random.PRNGKey(0), batch, train=False)
    out_base = model.apply(params, batch, train=False)

    import dataclasses
    gated_pc = dataclasses.replace(cfg.coarse2.post_config, rt=0.9, rd=0.8)
    cfg_g = dataclasses.replace(
        cfg, coarse2=dataclasses.replace(cfg.coarse2, post_config=gated_pc))
    if len(levels) > 1:
        gated_pc3 = dataclasses.replace(cfg.coarse3.post_config, rt=0.9,
                                        rd=0.8)
        cfg_g = dataclasses.replace(
            cfg_g, coarse3=dataclasses.replace(cfg.coarse3,
                                               post_config=gated_pc3))
    out_g = CasMTR(cfg_g).apply(params, batch, train=False)

    n_base = int(np.asarray(out_base.final_matches.valid).sum())
    n_gated = int(np.asarray(out_g.final_matches.valid).sum())
    assert n_gated <= n_base
    assert np.isfinite(np.asarray(out_g.final_matches.mkpts1)).all()
    # gated match set is a subset of the ungated one (as (i, j) pairs) —
    # but only when the base extraction was NOT capacity-truncated (at the
    # cap, gating frees slots for positions beyond the base top-M) and
    # modulo the keep-at-least-one fallback
    def pairs(m):
        v = np.asarray(m.valid)
        return set(zip(np.asarray(m.i_ids)[v].tolist(),
                       np.asarray(m.j_ids)[v].tolist()))
    cap = out_base.final_matches.valid.shape[0]
    if 1 < n_gated and n_base < cap:
        assert pairs(out_g.final_matches) <= pairs(out_base.final_matches)
