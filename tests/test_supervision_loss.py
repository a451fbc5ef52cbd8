"""Supervision (depth-warp GT), loss, and train-step tests on synthetic scenes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmtr_tpu.ops.geometry import warp_kpts
from casmtr_tpu.train import supervision as spv
from casmtr_tpu.train.loss import coarse_loss, cascade_loss, fine_loss
from casmtr_tpu.configs import build_config
from tests.test_casmtr_model import tiny_casmtr_cfg


def identity_batch(rng, size=64, b=1):
    """Two identical cameras at the same pose -> warp is the identity."""
    img = rng.random((b, size, size, 3)).astype(np.float32)
    depth = np.ones((b, size, size), np.float32)
    K = np.array([[[100.0, 0, size / 2], [0, 100.0, size / 2], [0, 0, 1]]],
                 np.float32).repeat(b, 0)
    T = np.eye(4, dtype=np.float32)[None].repeat(b, 0)
    return {
        "image0": jnp.asarray(img), "image1": jnp.asarray(img),
        "depth0": jnp.asarray(depth), "depth1": jnp.asarray(depth),
        "K0": jnp.asarray(K), "K1": jnp.asarray(K),
        "T_0to1": jnp.asarray(T), "T_1to0": jnp.asarray(T),
    }


def test_warp_kpts_identity(rng):
    batch = identity_batch(rng)
    pts = jnp.asarray(rng.random((1, 50, 2)).astype(np.float32) * 60)
    valid, warped = warp_kpts(pts, batch["depth0"], batch["depth1"],
                              batch["T_0to1"], batch["K0"], batch["K1"])
    np.testing.assert_allclose(np.asarray(warped), np.asarray(pts),
                               rtol=1e-3, atol=1e-2)
    assert np.asarray(valid).mean() > 0.9


def test_warp_kpts_translation(rng):
    """Pure x-translation of the camera shifts projections by -fx*tx/z."""
    batch = identity_batch(rng)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.1  # move camera; point shifts by fx * 0.1 / z = 10 px
    valid, warped = warp_kpts(
        jnp.asarray([[[32.0, 32.0]]]), batch["depth0"], batch["depth1"],
        jnp.asarray(T[None]), batch["K0"], batch["K1"])
    np.testing.assert_allclose(np.asarray(warped)[0, 0],
                               [42.0, 32.0], atol=0.1)


def test_supervision_identity_diagonal(rng):
    cfg = tiny_casmtr_cfg((4,))
    batch = identity_batch(rng)
    gt = spv.compute_supervision(batch, cfg)
    conf_gt = np.asarray(gt["conf_matrix_gt_8c"])[0]
    L = conf_gt.shape[0]
    # diagonal (except position 0, explicitly ignored) is the gt
    diag = np.diag(conf_gt)
    assert diag[1:].mean() > 0.9
    off = conf_gt - np.diag(diag)
    assert off.sum() == 0
    # cascade gt: identity mapping
    gi = np.asarray(gt["gt_idx_4c"])[0]
    gm = np.asarray(gt["gt_mask_4c"])[0]
    L4 = gi.shape[0]
    assert (gi[gm] == np.arange(L4)[gm]).all()
    assert gm[1:].mean() > 0.9


def test_coarse_loss_prefers_correct_prediction(rng):
    cfg = tiny_casmtr_cfg((4,))
    L = 16
    gt = np.zeros((1, L, L), np.float32)
    gt[0, np.arange(1, L), np.arange(1, L)] = 1
    good = jnp.asarray(0.9 * gt + 0.001)
    bad = jnp.asarray(0.9 * np.roll(gt, 1, axis=2) + 0.001)
    l_good = coarse_loss(good, jnp.asarray(gt), cfg.loss, sparse_spvs=False)
    l_bad = coarse_loss(bad, jnp.asarray(gt), cfg.loss, sparse_spvs=False)
    assert float(l_good) < float(l_bad)


def test_cascade_loss_masks_invalid_rows(rng):
    cfg = tiny_casmtr_cfg((4,))
    M, K = 8, 9
    label = np.zeros((M, K), np.float32)
    label[np.arange(M), rng.integers(0, K, M)] = 1
    conf = rng.random((M, K)).astype(np.float32)
    valid_all = jnp.ones(M, bool)
    valid_half = jnp.asarray([True] * 4 + [False] * 4)
    l_all = cascade_loss(jnp.asarray(conf), jnp.asarray(label), valid_all,
                         cfg.loss)
    # corrupting an invalid row must not change the loss
    conf2 = conf.copy()
    conf2[6] = 0.999
    l_half_a = cascade_loss(jnp.asarray(conf), jnp.asarray(label), valid_half,
                            cfg.loss)
    l_half_b = cascade_loss(jnp.asarray(conf2), jnp.asarray(label), valid_half,
                            cfg.loss)
    assert float(l_half_a) == pytest.approx(float(l_half_b), rel=1e-6)
    assert np.isfinite(float(l_all))


def test_fine_loss_zero_at_perfect_prediction(rng):
    cfg = tiny_casmtr_cfg((4,))
    M = 6
    gt_off = rng.uniform(-0.5, 0.5, (M, 2)).astype(np.float32)
    expec = np.concatenate([gt_off, np.ones((M, 1), np.float32)], -1)
    l = fine_loss(jnp.asarray(expec), jnp.asarray(gt_off),
                  jnp.ones(M, bool), cfg.loss)
    assert float(l) == pytest.approx(0.0, abs=1e-6)


def test_fine_loss_empty_valid_has_finite_grads(rng):
    """Zero valid rows (a no-gt, low-overlap batch): the l2_with_std weight
    normalizer is a masked mean over valid rows and becomes 0 -> w = inf ->
    the masked-out backward hits inf*0 = NaN in EVERY expec_f[:, :2] grad,
    and the train-step NaN guard then silently skips the whole step (this is
    exactly what froze the on-device soak: grad_norm=nan on every empty-gt
    step). Reference semantics: loss 0 with finite grads
    (cascade_loss.py:176-187 fabricates one correct row with weight 0)."""
    cfg = tiny_casmtr_cfg((4,))
    M = 8
    expec = jnp.asarray(rng.uniform(-0.5, 0.5, (M, 3)).astype(np.float32))
    gt_off = jnp.asarray(rng.uniform(-0.3, 0.3, (M, 2)).astype(np.float32))
    valid = jnp.zeros(M, bool)
    l, g = jax.value_and_grad(
        lambda e: fine_loss(e, gt_off, valid, cfg.loss))(expec)
    assert float(l) == 0.0
    assert bool(jnp.all(jnp.isfinite(g))), np.asarray(g)


def test_train_step_zero_overlap_batch_finite_grads(rng):
    """Full tiny train step on a ZERO-overlap pair (cameras looking at
    disjoint scenes -> no coarse gt anywhere, no valid cascade rows): the
    step must produce a finite grad norm and actually apply the update
    (grad_norm=nan would make the NaN guard skip every such step)."""
    from casmtr_tpu.models.casmtr import CasMTR
    from casmtr_tpu.train.train_step import init_train_state, make_train_step
    from casmtr_tpu.config import Config

    lcfg = tiny_casmtr_cfg((4,))
    cfg = Config(loftr=lcfg)
    model = CasMTR(lcfg)
    batch = identity_batch(rng)
    # push camera 1 far sideways: every warped kpt lands out of bounds
    T01 = np.eye(4, dtype=np.float32)
    T01[0, 3] = 100.0
    batch["T_0to1"] = jnp.asarray(T01[None])
    batch["T_1to0"] = jnp.asarray(np.linalg.inv(T01).astype(np.float32)[None])
    batch["image1"] = jnp.asarray(
        rng.random(batch["image0"].shape).astype(np.float32))

    from casmtr_tpu.train import supervision as spv
    gt = spv.compute_supervision(batch, lcfg)
    assert float(gt["conf_matrix_gt_8c"].sum()) == 0.0  # truly no gt

    state, tx = init_train_state(model, cfg, batch, jax.random.PRNGKey(0),
                                 steps_per_epoch=100, base_lr=1e-3)
    step = jax.jit(make_train_step(model, cfg, tx))
    state2, scalars = step(state, batch)
    assert np.isfinite(float(scalars["loss"]))
    assert np.isfinite(float(scalars["grad_norm"])), "NaN guard would skip"
    # the update must have been APPLIED, not skipped by the NaN guard: the
    # Adam step counts advance and the BN batch stats move only when the
    # guard judged the step good (params themselves may move ~0 here — the
    # batch carries no supervision signal, and warmup lr(0) may be 0)
    import optax
    counts = [int(s.count) for s in jax.tree_util.tree_leaves(
        state2.opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    assert counts and all(c == 1 for c in counts), counts
    bs_moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.batch_stats, state2.batch_stats)
    assert max(jax.tree_util.tree_leaves(bs_moved)) > 0.0


def test_train_step_decreases_loss(rng):
    from casmtr_tpu.models.casmtr import CasMTR
    from casmtr_tpu.train.train_step import init_train_state, make_train_step
    from casmtr_tpu.config import Config

    lcfg = tiny_casmtr_cfg((4,))
    cfg = Config(loftr=lcfg)
    model = CasMTR(lcfg)
    batch = identity_batch(rng)
    state, tx = init_train_state(model, cfg, batch, jax.random.PRNGKey(0),
                                 steps_per_epoch=100, base_lr=1e-3)
    step = jax.jit(make_train_step(model, cfg, tx))
    losses = []
    for _ in range(4):
        state, scalars = step(state, batch)
        losses.append(float(scalars["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_detector_branch_training(rng):
    """Training with a detector_mode produces detector labels and the loss
    includes the detector term."""
    from casmtr_tpu.config import override
    from casmtr_tpu.models.casmtr import CasMTR

    lcfg = tiny_casmtr_cfg((4,))
    lcfg = override(lcfg, {"coarse2": {"detector": "learnable",
                                       "detector_mode": "ST",
                                       "grid_size": 4}})
    model = CasMTR(lcfg)
    batch = identity_batch(rng)
    L4 = (64 // 4) ** 2
    batch["gt_idx_4c"] = jnp.asarray(
        np.arange(L4, dtype=np.int32)[None])
    batch["gt_mask_4c"] = jnp.ones((1, L4), bool)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, _ = model.apply(variables, batch, train=True,
                         mutable=["batch_stats"])
    st = out.cascades["4c"]
    assert st.detector_gt_label is not None
    assert st.detector_conf is not None
    from casmtr_tpu.train.loss import casmtr_loss
    from casmtr_tpu.train import supervision as spv
    gt = spv.compute_supervision(batch, lcfg)
    loss, scalars = casmtr_loss(out, gt, None, lcfg)
    assert "loss_4c_det" in scalars
    assert np.isfinite(float(loss))


def test_warp_kpts_zero_target_depth_is_invalid():
    """A keypoint landing in a depth HOLE of image1 (w_depth == 0) must be
    invalid: the reference's division by the raw depth gives inf -> fails
    the <0.2 consistency check (reference geometry.py:53). Substituting a
    large denominator would flip it to valid."""
    import jax.numpy as jnp
    import numpy as np
    from casmtr_tpu.ops.geometry import warp_kpts

    H = W = 16
    depth0 = np.full((1, H, W), 2.0, np.float32)
    depth1_ok = np.full((1, H, W), 2.0, np.float32)
    depth1_hole = np.zeros((1, H, W), np.float32)  # all holes
    K = np.asarray([[[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]]], np.float32)
    T = np.eye(4, dtype=np.float32)[None]
    pts = np.asarray([[[8.0, 8.0], [4.0, 4.0]]], np.float32)

    ok, _ = warp_kpts(jnp.asarray(pts), jnp.asarray(depth0),
                      jnp.asarray(depth1_ok), jnp.asarray(T),
                      jnp.asarray(K), jnp.asarray(K))
    hole, _ = warp_kpts(jnp.asarray(pts), jnp.asarray(depth0),
                        jnp.asarray(depth1_hole), jnp.asarray(T),
                        jnp.asarray(K), jnp.asarray(K))
    assert np.asarray(ok).all()
    assert not np.asarray(hole).any()
