"""Ground-truth generation by depth+pose warping.

Functional equivalent of reference src/model/functions/supervision.py:20-295
(spvs_coarse / spvs_cascade_coarse / spvs_cascade_fine), returning a dict of
static-shape gt arrays instead of mutating a batch dict. The per-level gt is
computed BEFORE the model forward (the model's training extraction consumes
``gt_idx_*``/``gt_mask_*``; reference lightning_cascade.py:191-206 computes
supervision first for the same reason).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from casmtr_tpu.config import LoftrConfig
from casmtr_tpu.ops.geometry import warp_kpts
from casmtr_tpu.ops.image_ops import resize_nearest


def _grid_pts(b: int, h: int, w: int) -> jnp.ndarray:
    """[B, h*w, 2] (x, y) grid coordinates."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    g = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    return jnp.broadcast_to(g[None], (b, h * w, 2))


def _level_grid_warp(batch: Dict, scale: int):
    """Warp the level grid both directions (reference supervision.py:140-179).

    Returns (nearest_index1 [B, L0], correct_0to1 [B, L0], w_pt0_i, grid_pt1_i).
    """
    img0, img1 = batch["image0"], batch["image1"]
    B, H0, W0 = img0.shape[0], img0.shape[1], img0.shape[2]
    H1, W1 = img1.shape[1], img1.shape[2]
    h0, w0, h1, w1 = H0 // scale, W0 // scale, H1 // scale, W1 // scale

    if "scale0" in batch:
        scale0 = scale * batch["scale0"][:, None]   # [B, 1, 2]
        scale1 = scale * batch["scale1"][:, None]
    else:
        scale0 = scale1 = float(scale)

    grid_pt0_i = _grid_pts(B, h0, w0) * scale0
    grid_pt1_i = _grid_pts(B, h1, w1) * scale1

    if "mask0" in batch:
        m0 = resize_nearest(batch["mask0"][..., None].astype(jnp.float32),
                            h0, w0)[..., 0].reshape(B, -1) > 0
        m1 = resize_nearest(batch["mask1"][..., None].astype(jnp.float32),
                            h1, w1)[..., 0].reshape(B, -1) > 0
        grid_pt0_i = jnp.where(m0[..., None], grid_pt0_i, 0.0)
        grid_pt1_i = jnp.where(m1[..., None], grid_pt1_i, 0.0)

    _, w_pt0_i = warp_kpts(grid_pt0_i, batch["depth0"], batch["depth1"],
                           batch["T_0to1"], batch["K0"], batch["K1"])
    _, w_pt1_i = warp_kpts(grid_pt1_i, batch["depth1"], batch["depth0"],
                           batch["T_1to0"], batch["K1"], batch["K0"])
    w_pt0_c = w_pt0_i / scale1
    w_pt1_c = w_pt1_i / scale0

    w0r = jnp.round(w_pt0_c).astype(jnp.int32)
    nearest_index1 = w0r[..., 0] + w0r[..., 1] * w1
    w1r = jnp.round(w_pt1_c).astype(jnp.int32)
    nearest_index0 = w1r[..., 0] + w1r[..., 1] * w0

    def oob(pt, w_, h_):
        return ((pt[..., 0] < 0) | (pt[..., 0] >= w_)
                | (pt[..., 1] < 0) | (pt[..., 1] >= h_))

    nearest_index1 = jnp.where(oob(w0r, w1, h1), 0, nearest_index1)
    nearest_index0 = jnp.where(oob(w1r, w0, h0), 0, nearest_index0)

    loop_back = jnp.take_along_axis(nearest_index0, nearest_index1, axis=1)
    correct = loop_back == jnp.arange(h0 * w0, dtype=jnp.int32)[None]
    correct = correct.at[:, 0].set(False)  # ignore the 0-depth sink cell
    return nearest_index1, correct, w_pt0_i, grid_pt1_i, (h0, w0, h1, w1)


def compute_supervision(batch: Dict, cfg: LoftrConfig) -> Dict[str, jnp.ndarray]:
    """GT for all levels. Returns keys:
    - conf_matrix_gt_8c [B, L0, L1] (coarsest level);
    - gt_idx_{4,2}c / gt_mask_{4,2}c per cascade level;
    - spv_w_pt0_i / spv_pt1_i of the last level (for fine supervision).
    """
    out = {}
    coarse_scale = cfg.coarse_level
    n1, correct, w_pt0_i, pt1_i, (h0, w0, h1, w1) = _level_grid_warp(
        batch, coarse_scale)
    conf_gt = jnp.zeros((n1.shape[0], h0 * w0, h1 * w1), jnp.float32)
    b = jnp.arange(n1.shape[0])[:, None]
    i = jnp.arange(h0 * w0)[None]
    conf_gt = conf_gt.at[b, i, n1].set(correct.astype(jnp.float32))
    out["conf_matrix_gt_8c"] = conf_gt

    if cfg.cascade:
        for level in cfg.cascade_levels:
            n1l, correctl, w_pt0, pt1, _ = _level_grid_warp(batch, level)
            out[f"gt_idx_{level}c"] = n1l
            out[f"gt_mask_{level}c"] = correctl
            out["spv_w_pt0_i"] = w_pt0
            out["spv_pt1_i"] = pt1
    else:
        out["spv_w_pt0_i"] = w_pt0_i
        out["spv_pt1_i"] = pt1_i
    return out


def fine_expec_gt(gt: Dict, matches, batch: Dict, cfg: LoftrConfig
                  ) -> jnp.ndarray:
    """Fine-level gt offsets for the selected matches
    (reference supervision.py:258-284). Returns [M, 2] normalized by the
    window radius at the fine level."""
    scale = cfg.fine_level if cfg.cascade else cfg.resolution[1]
    radius = cfg.fine_window_size // 2
    b, i, j = matches.b_ids, matches.i_ids, matches.j_ids
    if "scale1" in batch:
        sc = scale * batch["scale1"][b]     # [M, 2]
    else:
        sc = float(scale)
    return (gt["spv_w_pt0_i"][b, i] - gt["spv_pt1_i"][b, j]) / sc / radius
