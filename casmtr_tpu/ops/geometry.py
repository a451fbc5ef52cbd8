"""Depth-based keypoint warping (reference: src/model/functions/
geometry.py:5-54), vectorized in jnp."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _sample_depth(depth: jnp.ndarray, pts_long: jnp.ndarray) -> jnp.ndarray:
    """depth: [B, H, W]; pts_long: [B, L, 2] (x, y) int32 -> [B, L]."""
    h, w = depth.shape[1:3]
    x = jnp.clip(pts_long[..., 0], 0, w - 1)
    y = jnp.clip(pts_long[..., 1], 0, h - 1)
    return jnp.take_along_axis(
        depth.reshape(depth.shape[0], -1), y * w + x, axis=1)


def warp_kpts(kpts0: jnp.ndarray, depth0: jnp.ndarray, depth1: jnp.ndarray,
              T_0to1: jnp.ndarray, K0: jnp.ndarray, K1: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp kpts0 from image0 to image1 via depth unproject + rigid transform.

    kpts0: [B, L, 2] (x, y) pixels; depth0/1: [B, H, W]; T_0to1: [B, 4, 4] or
    [B, 3, 4]; K0/K1: [B, 3, 3]. Returns (valid_mask [B, L], w_kpts0 [B, L, 2]).
    Validity = nonzero source depth & covisible & relative depth error < 0.2.
    """
    kpts0_long = jnp.round(kpts0).astype(jnp.int32)
    kpts0_depth = _sample_depth(depth0, kpts0_long)            # [B, L]
    nonzero = kpts0_depth != 0

    ones = jnp.ones_like(kpts0[..., :1])
    kpts0_h = jnp.concatenate([kpts0, ones], axis=-1) * kpts0_depth[..., None]
    kpts0_cam = jnp.linalg.inv(K0) @ jnp.swapaxes(kpts0_h, 1, 2)  # [B, 3, L]

    w_cam = T_0to1[:, :3, :3] @ kpts0_cam + T_0to1[:, :3, 3:4]   # [B, 3, L]
    w_depth_computed = w_cam[:, 2, :]
    w_h = jnp.swapaxes(K1 @ w_cam, 1, 2)                          # [B, L, 3]
    w_kpts0 = w_h[..., :2] / (w_h[..., 2:3] + 1e-4)

    h, w = depth1.shape[1:3]
    covis = ((w_kpts0[..., 0] > 0) & (w_kpts0[..., 0] < w - 1)
             & (w_kpts0[..., 1] > 0) & (w_kpts0[..., 1] < h - 1))
    w_long = jnp.where(covis[..., None], w_kpts0.astype(jnp.int32), 0)
    w_depth = _sample_depth(depth1, w_long)
    # zero target depth (depth hole) must be INVALID: the reference divides
    # by the raw depth so 0 -> inf/nan -> fails the <0.2 check
    # (reference geometry.py:53); substituting a huge denominator would flip
    # it to valid (ratio ~ 0)
    consistent = (w_depth != 0) & (
        jnp.abs((w_depth - w_depth_computed)
                / jnp.where(w_depth == 0, 1.0, w_depth)) < 0.2)
    return nonzero & covis & consistent, w_kpts0
