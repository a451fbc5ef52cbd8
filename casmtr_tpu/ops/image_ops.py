"""Image-grid helpers (NHWC): bilinear resize with align_corners=True parity,
nearest resize, and average pooling.

The reference relies on torch ``F.interpolate(..., align_corners=True)``
(e.g. resnet_fpn.py:114,118, cascade_model_stage3.py:39) whose sampling grid
differs from ``jax.image.resize`` (half-pixel centers), so we implement the
align-corners grid explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int
                                  ) -> jnp.ndarray:
    """Bilinear resize of [B, H, W, C] with align_corners=True sampling."""
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x

    def axis_weights(n_in, n_out):
        if n_out == 1 or n_in == 1:
            pos = jnp.zeros((n_out,), jnp.float32)
        else:
            pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        frac = pos - lo.astype(jnp.float32)
        return lo, hi, frac

    ylo, yhi, fy = axis_weights(h, out_h)
    xlo, xhi, fx = axis_weights(w, out_w)

    top = x[:, ylo]          # [B, out_h, W, C]
    bot = x[:, yhi]
    rows = top + (bot - top) * fy[None, :, None, None].astype(x.dtype)
    left = rows[:, :, xlo]   # [B, out_h, out_w, C]
    right = rows[:, :, xhi]
    return left + (right - left) * fx[None, None, :, None].astype(x.dtype)


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbour resize of [B, H, W, C] (torch F.interpolate 'nearest'
    parity: src index = floor(dst * scale))."""
    b, h, w, c = x.shape
    ys = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return x[:, ys][:, :, xs]


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pooling of [B, H, W, C] (torch F.avg_pool2d parity;
    used to build the quadtree pyramid, reference src/model/modules/
    quadtree_attention.py:87-89)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


def max_pool_same(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Max pool with stride 1 and 'same' padding of [B, H, W, C] (for NMS;
    torch F.max_pool2d(kernel, stride=1, padding=w//2) parity)."""
    pad = window // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)))
