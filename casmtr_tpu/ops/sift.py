"""Scale-space blob-keypoint filtering for the 'sift' post-process.

Functional equivalent of the reference's kornia pipeline
(src/model/functions/post_processing.py:46-75: ScaleSpaceDetector(4096,
resp_module=BlobHessian(), scale_pyr_module=ScalePyramid(3, 1.6, 64,
double_image=True)) on grayscale image0, keypoint centers quantized to the
coarse grid, scatter into a keep-mask AND'd with the confidence threshold).

TPU-native design, NOT a kornia port:
* static shapes throughout — the pyramid octave count and sizes come from
  the (static) image shape; keypoints live in a fixed top-4096 capacity
  with a validity mask (exactly the framework's fixed-capacity idiom);
* separable Gaussian blurs as depthwise convs; scale-normalized Hessian
  determinant (sigma^4 * (Ixx*Iyy - Ixy^2)) as the blob response;
* 3x3x3 (scale, y, x) local-max NMS inside each octave, global exact
  top-k across octaves (2-D reshaped — ops/quadtree.exact_topk rules).

DOCUMENTED DEVIATION: kornia's ConvQuadInterp3d sub-pixel/sub-scale
refinement and LAF orientation are omitted — only keypoint CENTERS reach
the mask, quantized to stride-`level` cells, where sub-pixel shifts almost
never change the cell; bit-parity with kornia is untestable offline
(kornia is not installed — the reference's own recipes never enable
'sift'). The structure (pyramid config, response, NMS radius, 4096 cap,
cell scatter) mirrors the reference line-for-line.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(sigma: float) -> np.ndarray:
    r = max(int(math.ceil(3.0 * sigma)), 1)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur, [B, H, W] (SAME padding by edge replicate —
    kornia uses reflect; boundary cells are border-suppressed later)."""
    k = jnp.asarray(_gaussian_kernel1d(sigma))
    r = k.shape[0] // 2
    x = jnp.pad(img, ((0, 0), (r, r), (0, 0)), mode="edge")
    x = _conv1d(x, k, axis=1)
    x = jnp.pad(x, ((0, 0), (0, 0), (r, r)), mode="edge")
    x = _conv1d(x, k, axis=2)
    return x


def _conv1d(x: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    """1-D correlation along ``axis`` of [B, H, W] via conv_general_dilated
    (depthwise over the other spatial dim)."""
    B = x.shape[0]
    if axis == 1:
        lhs = x[:, None]                      # [B, 1, H, W]
        rhs = k[None, None, :, None]          # OIHW [1,1,K,1]
    else:
        lhs = x[:, None]
        rhs = k[None, None, None, :]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[:, 0]


def _hessian_det(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Scale-normalized Hessian determinant response, [B, H, W]."""
    # 3x3 second-derivative stencils (standard finite differences)
    def d2(x, kern):
        k = jnp.asarray(kern, jnp.float32)[None, None]
        y = jax.lax.conv_general_dilated(
            x[:, None], k, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y[:, 0]

    ixx = d2(img, [[0.0, 0, 0], [1, -2, 1], [0, 0, 0]])
    iyy = d2(img, [[0.0, 1, 0], [0, -2, 0], [0, 1, 0]])
    ixy = d2(img, [[0.25, 0, -0.25], [0, 0, 0], [-0.25, 0, 0.25]])
    return (sigma ** 4) * (ixx * iyy - ixy * ixy)


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    return img[:, ::2, ::2]


def _upsample2(img: jnp.ndarray) -> jnp.ndarray:
    B, H, W = img.shape
    return jax.image.resize(img, (B, 2 * H, 2 * W), method="bilinear")


def scale_space_keypoints(gray: jnp.ndarray, max_kpts: int = 4096,
                          n_levels: int = 3, init_sigma: float = 1.6,
                          min_size: int = 64, double_image: bool = True,
                          resp_thr: float = 1e-5,
                          valid_mask: Optional[jnp.ndarray] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Detect blob keypoints on [B, H, W] grayscale in [0, 1].

    Returns (kpts_xy [B, max_kpts, 2] float32 in ORIGINAL pixel coords,
    valid [B, max_kpts] bool), responses sorted descending per batch row.
    ``valid_mask`` ([B, H, W] bool) suppresses responses in padded regions
    (the reference crops to the unpadded extent; masking is the
    static-shape equivalent)."""
    B, H, W = gray.shape
    img = _upsample2(gray) if double_image else gray
    scale0 = 0.5 if double_image else 1.0
    if valid_mask is not None:
        vm = _upsample2(valid_mask.astype(jnp.float32)) > 0.5 \
            if double_image else valid_mask
    else:
        vm = None

    sigmas = [init_sigma * (2.0 ** (i / n_levels))
              for i in range(n_levels + 2)]
    all_resp, all_meta = [], []   # flattened responses + (scale, h, w)
    oct_scale = scale0
    while min(img.shape[1], img.shape[2]) >= min_size:
        Ho, Wo = img.shape[1], img.shape[2]
        resp = jnp.stack([_hessian_det(_blur(img, s), s) for s in sigmas],
                         axis=1)                       # [B, L+2, Ho, Wo]
        # 3x3x3 local max over (level, y, x) for the middle levels
        mid = resp[:, 1:-1]
        neigh = jnp.full_like(mid, -jnp.inf)
        for dl in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dl == dy == dx == 0:
                        continue
                    sl = resp[:, 1 + dl:resp.shape[1] - 1 + dl]
                    sl = jnp.roll(sl, (dy, dx), axis=(2, 3))
                    neigh = jnp.maximum(neigh, sl)
        is_max = (mid > neigh) & (mid > resp_thr)
        # border suppression (roll wrap + blur edge effects)
        border = jnp.zeros((Ho, Wo), bool).at[1:-1, 1:-1].set(True)
        is_max &= border[None, None]
        if vm is not None:
            is_max &= vm[:, None]
        all_resp.append(jnp.where(is_max, mid, -jnp.inf).reshape(B, -1))
        all_meta.append((oct_scale, Ho, Wo))
        img = _downsample2(img)
        if vm is not None:
            vm = vm[:, ::2, ::2]
        oct_scale *= 2.0

    if not all_resp:
        raise ValueError(
            f"image {gray.shape[1]}x{gray.shape[2]} too small for the "
            f"scale pyramid (needs >= {min_size} px on the short side"
            f"{' after 2x doubling' if double_image else ''})")
    flat = jnp.concatenate(all_resp, axis=1)           # [B, sum(L*Ho*Wo)]
    k = min(max_kpts, flat.shape[1])
    from casmtr_tpu.ops.quadtree import exact_topk
    vals, idx = exact_topk(flat, k)                    # [B, k]
    # decode octave/level/y/x from the flat index (static per-octave spans)
    xy = jnp.zeros((B, k, 2), jnp.float32)
    off = 0
    for (s_o, Ho, Wo), r in zip(all_meta, all_resp):
        span = r.shape[1]
        local = idx - off
        inside = (local >= 0) & (local < span)
        yx = local % (Ho * Wo)
        y = (yx // Wo).astype(jnp.float32) * s_o
        x = (yx % Wo).astype(jnp.float32) * s_o
        xy = jnp.where(inside[..., None], jnp.stack([x, y], -1), xy)
        off += span
    valid = jnp.isfinite(vals) & (vals > resp_thr)
    if k < max_kpts:
        pad = max_kpts - k
        xy = jnp.pad(xy, ((0, 0), (0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    return xy, valid


def sift_cell_mask(image0: jnp.ndarray, hw_c: Tuple[int, int], stride: int,
                   max_kpts: int = 4096,
                   valid_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[B, L0c] bool: True where the stride-`stride` coarse cell contains a
    detected keypoint (reference post_processing.py:66-75: keypoint px
    coords / level, rounded, clamped, scattered)."""
    if image0.ndim == 4:                               # [B, H, W, 3] RGB
        gray = (0.299 * image0[..., 0] + 0.587 * image0[..., 1]
                + 0.114 * image0[..., 2])
    else:
        gray = image0
    h0, w0 = hw_c
    xy, valid = scale_space_keypoints(gray, max_kpts=max_kpts,
                                      valid_mask=valid_mask)
    # Reference quirk reproduced exactly (post_processing.py:70-72): the
    # FLOAT flat index y/L*w0c + x/L is clamped then rounded as a whole, so
    # a fractional row bleeds into the column (y=3.6 -> contributes 0.6*w0
    # worth of columns). Per-axis round+clamp would be geometrically saner
    # but the project invariant is exact reference semantics.
    flat = xy[..., 1] / stride * w0 + xy[..., 0] / stride
    cell = jnp.round(jnp.clip(flat, 0, h0 * w0 - 1)).astype(jnp.int32)
    cell = jnp.where(valid, cell, h0 * w0)             # invalid -> OOB drop
    B = gray.shape[0]
    mask = jnp.zeros((B, h0 * w0 + 1), bool)
    mask = mask.at[jnp.arange(B)[:, None], cell].set(True, mode="drop")
    return mask[:, :h0 * w0]
