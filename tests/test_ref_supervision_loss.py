"""Supervision-GT and loss parity against the ACTUAL reference torch code.

Imports /root/reference's `src/model/functions/supervision.py` (depth+pose
warp GT generation) and `src/losses/cascade_loss.py` (CascadeLoss) on CPU via
tests/ref_stubs.py and asserts our jnp equivalents produce the same GT arrays
and the same loss VALUES on identical inputs — including the subtle reference
semantics: the element weight scales the loss numerator but not the
selected-count denominator (cascade_loss.py:50-53,94-96), the fine inverse-std
normalization runs over all real rows (:170-173), and non-finite fine gt rows
fall out of the correct-mask via NaN comparisons (:150,168).
"""

import dataclasses
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from casmtr_tpu.train import supervision as spv
from casmtr_tpu.train.loss import cascade_loss, coarse_loss, fine_loss
from tests.ref_stubs import install, reference_config
from tests.test_casmtr_model import tiny_casmtr_cfg

install()


# ---------------------------------------------------------------------------
# synthetic two-view scene (fronto-parallel plane + smooth relief, small
# translation, resize scales, padded regions, zero-depth holes)
# ---------------------------------------------------------------------------

def scene_batch(rng, b=2, size=64):
    def smooth_depth():
        base = rng.random((b, 8, 8)).astype(np.float32)
        return 3.0 + 0.1 * np.kron(base, np.ones((size // 8, size // 8),
                                                 np.float32))

    depth0, depth1 = smooth_depth(), smooth_depth()
    depth0[:, 20:24, 20:24] = 0.0                      # zero-depth hole
    img = rng.random((b, size, size, 3)).astype(np.float32)
    K = np.array([[100.0, 0, size / 2], [0, 100.0, size / 2], [0, 0, 1]],
                 np.float32)[None].repeat(b, 0)
    T01 = np.eye(4, dtype=np.float32)
    T01[:3, 3] = [0.15, 0.08, 0.0]
    T10 = np.linalg.inv(T01).astype(np.float32)
    mask0 = np.ones((b, size, size), bool)
    mask0[:, :, -16:] = False                          # right pad on image0
    mask1 = np.ones((b, size, size), bool)
    mask1[:, -16:, :] = False                          # bottom pad on image1
    return {
        "image0": img, "image1": img,
        "depth0": depth0, "depth1": depth1,
        "K0": K, "K1": K,
        "T_0to1": T01[None].repeat(b, 0), "T_1to0": T10[None].repeat(b, 0),
        "scale0": np.full((b, 2), 0.9, np.float32),
        "scale1": np.full((b, 2), 0.8, np.float32),
        "mask0": mask0, "mask1": mask1,
    }


def torch_batch(batch):
    """Reference-layout data dict (NCHW images, mask0_origin keys)."""
    t = lambda x: torch.from_numpy(np.asarray(x))
    return {
        "image0": t(batch["image0"]).permute(0, 3, 1, 2),
        "image1": t(batch["image1"]).permute(0, 3, 1, 2),
        "depth0": t(batch["depth0"]), "depth1": t(batch["depth1"]),
        "K0": t(batch["K0"]), "K1": t(batch["K1"]),
        "T_0to1": t(batch["T_0to1"]), "T_1to0": t(batch["T_1to0"]),
        "scale0": t(batch["scale0"]), "scale1": t(batch["scale1"]),
        "mask0_origin": t(batch["mask0"]), "mask1_origin": t(batch["mask1"]),
        "dataset_name": ["megadepth", "megadepth"],
        "pair_names": ["synthetic"] * 2,
    }


REF_SUP_CFG = {"LOFTR": {"CASCADE": True, "COARSE_LEVEL": 8,
                         "CASCADE_LEVELS": [4], "FINE_LEVEL": 2,
                         "FINE_WINDOW_SIZE": 5, "RESOLUTION": (8, 2)}}


def test_ref_supervision_parity(rng):
    """conf_matrix_gt + per-level gt idx/mask + warp intermediates match the
    reference spvs_cascade_coarse exactly (supervision.py:116-228)."""
    from src.model.functions.supervision import compute_supervision_coarse

    batch = scene_batch(rng)
    ref_data = torch_batch(batch)
    compute_supervision_coarse(ref_data, REF_SUP_CFG)

    lcfg = tiny_casmtr_cfg((4,))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    gt = spv.compute_supervision(jb, lcfg)

    ref8 = ref_data["gt_stage_8c"]
    np.testing.assert_array_equal(
        np.asarray(gt["conf_matrix_gt_8c"]),
        ref8["conf_matrix_gt"].numpy())

    ref4 = ref_data["gt_stage_4c"]
    np.testing.assert_array_equal(np.asarray(gt["gt_idx_4c"]),
                                  ref4["gt_idx_c01"].numpy())
    np.testing.assert_array_equal(np.asarray(gt["gt_mask_4c"]),
                                  ref4["gt_mask_c01"].numpy())
    np.testing.assert_allclose(np.asarray(gt["spv_w_pt0_i"]),
                               ref4["spv_w_pt0_i"].numpy(),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gt["spv_pt1_i"]),
                               ref4["spv_pt1_i"].numpy(),
                               rtol=1e-5, atol=1e-5)
    # the scene must actually produce matches for this test to mean anything
    assert ref4["gt_mask_c01"].numpy().sum() > 50


def test_ref_fine_supervision_parity(rng):
    """expec_f_gt for identical match ids matches spvs_cascade_fine
    (supervision.py:262-284)."""
    from src.model.functions.supervision import (compute_supervision_coarse,
                                                 spvs_cascade_fine)

    batch = scene_batch(rng)
    ref_data = torch_batch(batch)
    compute_supervision_coarse(ref_data, REF_SUP_CFG)

    lcfg = tiny_casmtr_cfg((4,))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    gt = spv.compute_supervision(jb, lcfg)

    # take the first M gt matches as the "predicted" ids on both sides
    gm = np.asarray(gt["gt_mask_4c"])
    b_ids, i_ids = np.nonzero(gm)
    M = min(32, len(b_ids))
    b_ids, i_ids = b_ids[:M], i_ids[:M]
    j_ids = np.asarray(gt["gt_idx_4c"])[b_ids, i_ids]

    ref_data["stage_4c"] = {
        "b_ids": torch.from_numpy(b_ids), "i_ids": torch.from_numpy(i_ids),
        "j_ids": torch.from_numpy(j_ids)}
    spvs_cascade_fine(ref_data, REF_SUP_CFG)

    matches = SimpleNamespace(b_ids=jnp.asarray(b_ids),
                              i_ids=jnp.asarray(i_ids),
                              j_ids=jnp.asarray(j_ids))
    ours = spv.fine_expec_gt(gt, matches, jb, lcfg)
    np.testing.assert_allclose(np.asarray(ours),
                               ref_data["expec_f_gt"].numpy(),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# loss-value parity (reference CascadeLoss methods on identical tensors)
# ---------------------------------------------------------------------------

def _ref_loss(coarse_type="focal", cascade_type="focal", sparse=False,
              fine_type="l2_with_std"):
    rc = reference_config()
    rc["loftr"]["coarse_level"] = 8
    rc["loftr"]["cascade_levels"] = [4]
    rc["loftr"]["loss"]["coarse_type"] = coarse_type
    rc["loftr"]["loss"]["cascade_type"] = cascade_type
    rc["loftr"]["loss"]["fine_type"] = fine_type
    rc["loftr"]["match_coarse"]["sparse_spvs"] = sparse
    from src.losses.cascade_loss import CascadeLoss
    mod = CascadeLoss(rc)
    mod.train()
    return mod


def _our_loss_cfg(ref_mod, **over):
    lc = tiny_casmtr_cfg((4,)).loss
    # mirror the reference's constants so only the formulas are under test
    rl = ref_mod.loss_config
    return dataclasses.replace(
        lc, focal_alpha=rl["focal_alpha"], focal_gamma=rl["focal_gamma"],
        pos_weight=rl["pos_weight"], neg_weight=rl["neg_weight"],
        fine_correct_thr=rl["fine_correct_thr"], **over)


def _coarse_inputs(rng, B=2, L0=24, L1=20, n_pos=30):
    conf = rng.uniform(0.01, 0.99, (B, L0, L1)).astype(np.float32)
    gt = np.zeros((B, L0, L1), np.float32)
    bs = rng.integers(0, B, n_pos)
    gt[bs, rng.integers(0, L0, n_pos), rng.integers(0, L1, n_pos)] = 1
    w = (rng.random((B, L0, L1)) > 0.3).astype(np.float32)
    return conf, gt, w


@pytest.mark.parametrize("coarse_type,sparse", [
    ("focal", False), ("focal", True), ("cross_entropy", False)])
def test_ref_coarse_loss_parity(rng, coarse_type, sparse):
    """Weighted coarse loss == reference compute_coarse_loss — the weight
    scales the numerator only (cascade_loss.py:50-53,94-96)."""
    conf, gt, w = _coarse_inputs(rng)
    ref_mod = _ref_loss(coarse_type=coarse_type, sparse=sparse)
    ref = ref_mod.compute_coarse_loss(
        torch.from_numpy(conf), torch.from_numpy(gt), torch.from_numpy(w))
    ours = coarse_loss(jnp.asarray(conf), jnp.asarray(gt),
                       _our_loss_cfg(ref_mod, coarse_type=coarse_type),
                       sparse_spvs=sparse, weight=jnp.asarray(w))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    # and unweighted
    ref = ref_mod.compute_coarse_loss(torch.from_numpy(conf),
                                      torch.from_numpy(gt), None)
    ours = coarse_loss(jnp.asarray(conf), jnp.asarray(gt),
                       _our_loss_cfg(ref_mod, coarse_type=coarse_type),
                       sparse_spvs=sparse)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


@pytest.mark.parametrize("cascade_type",
                         ["focal", "cross_entropy", "binary_cross_entropy"])
def test_ref_cascade_loss_parity(rng, cascade_type):
    """Window-label loss == reference compute_cascade_loss, including with
    fixed-capacity padding rows masked out by `valid`."""
    M, K = 24, 9
    conf = rng.uniform(0.01, 0.99, (M, K)).astype(np.float32)
    gt = np.zeros((M, K), np.float32)
    gt[np.arange(M), rng.integers(0, K, M)] = 1
    ref_mod = _ref_loss(cascade_type=cascade_type)
    ref = ref_mod.compute_cascade_loss(torch.from_numpy(conf),
                                       torch.from_numpy(gt))
    lcfg = _our_loss_cfg(ref_mod, cascade_type=cascade_type)
    ours = cascade_loss(jnp.asarray(conf), jnp.asarray(gt),
                        jnp.ones(M, bool), lcfg)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    # padded capacity: 8 garbage rows + valid mask == reference on real rows
    pad_conf = np.concatenate(
        [conf, rng.uniform(0.01, 0.99, (8, K)).astype(np.float32)])
    pad_gt = np.concatenate([gt, np.full((8, K), 0.5, np.float32)])
    ours_pad = cascade_loss(jnp.asarray(pad_conf), jnp.asarray(pad_gt),
                            jnp.asarray([True] * M + [False] * 8), lcfg)
    np.testing.assert_allclose(float(ours_pad), float(ref), rtol=1e-5)


@pytest.mark.parametrize("fine_type", ["l2_with_std", "l2"])
def test_ref_fine_loss_parity(rng, fine_type):
    """Fine offset loss == reference, including a NaN gt row (excluded via
    the raw correct-mask) and fixed-capacity padding rows."""
    M = 20
    expec = rng.uniform(-0.5, 0.5, (M, 3)).astype(np.float32)
    expec[:, 2] = rng.uniform(0.1, 1.0, M)             # std
    gt = rng.uniform(-0.6, 0.6, (M, 2)).astype(np.float32)
    gt[3] = [2.5, 0.1]                                 # beyond correct_thr
    gt[7] = np.nan                                     # invalid warp row
    ref_mod = _ref_loss(fine_type=fine_type)
    ref_in = (torch.from_numpy(expec.copy()) if fine_type == "l2_with_std"
              else torch.from_numpy(expec[:, :2].copy()))
    ref = ref_mod.compute_fine_loss(ref_in, torch.from_numpy(gt.copy()))
    lcfg = _our_loss_cfg(ref_mod, fine_type=fine_type)
    ours = fine_loss(jnp.asarray(expec), jnp.asarray(gt),
                     jnp.ones(M, bool), lcfg)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    # capacity padding: garbage std in the pad rows must not shift the
    # inverse-std normalization (reference :170-173 has no padding rows)
    pad_expec = np.concatenate(
        [expec, rng.uniform(1e-6, 2e-6, (6, 3)).astype(np.float32)])
    pad_gt = np.concatenate([gt, np.zeros((6, 2), np.float32)])
    ours_pad = fine_loss(jnp.asarray(pad_expec), jnp.asarray(pad_gt),
                         jnp.asarray([True] * M + [False] * 6), lcfg)
    np.testing.assert_allclose(float(ours_pad), float(ref), rtol=1e-5)
