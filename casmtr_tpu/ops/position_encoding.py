"""Sinusoidal position encodings (reference: src/model/functions/
position_encoding.py:8-123), as pure functions of the feature-map shape.

Feature layout is NHWC (TPU-native); the channel interleave pattern
(sin_x, cos_x, sin_y, cos_y at channels 0::4,1::4,2::4,3::4) matches the
reference exactly so converted checkpoints see identical encodings.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _interleave(sin_x, cos_x, sin_y, cos_y, d_model):
    """Stack [C//4,H,W] components into [H, W, C] with the 0::4 channel pattern."""
    pe = np.zeros((d_model,) + sin_x.shape[1:], dtype=np.float32)
    pe[0::4] = sin_x
    pe[1::4] = cos_x
    pe[2::4] = sin_y
    pe[3::4] = cos_y
    return np.transpose(pe, (1, 2, 0))  # [H, W, C]


def sine_pe(d_model: int, h: int, w: int,
            max_shape: Tuple[int, int] = (256, 256),
            temp_bug_fix: bool = True) -> jnp.ndarray:
    """PositionEncodingSine (reference: position_encoding.py:8-44). [H, W, C]."""
    y_pos = np.cumsum(np.ones((h, w), np.float32), axis=0)[None]
    x_pos = np.cumsum(np.ones((h, w), np.float32), axis=1)[None]
    if temp_bug_fix:
        div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32)
                     * (-math.log(10000.0) / (d_model // 2)))
    else:  # reproduce the original LoFTR bug (integer-division of the log term)
        div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32)
                     * (-math.log(10000.0) / d_model // 2))
    div = div[:, None, None]
    return jnp.asarray(_interleave(np.sin(x_pos * div), np.cos(x_pos * div),
                                   np.sin(y_pos * div), np.cos(y_pos * div),
                                   d_model))


def sine_pe_norm(d_model: int, h: int, w: int,
                 max_shape: Tuple[int, int] = (256, 256)) -> jnp.ndarray:
    """PositionEncodingSineNorm (reference: position_encoding.py:47-86): the
    cumsum positions are rescaled by max_shape/(h,w) so the encoding learned at
    train size transfers to other test sizes. Returns [H, W, C]."""
    y_pos = (np.cumsum(np.ones((h, w), np.float32), axis=0)[None]
             * max_shape[0] / h)
    x_pos = (np.cumsum(np.ones((h, w), np.float32), axis=1)[None]
             * max_shape[1] / w)
    div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32)
                 * (-math.log(10000.0) / (d_model // 2)))
    div = div[:, None, None]
    return jnp.asarray(_interleave(np.sin(x_pos * div), np.cos(x_pos * div),
                                   np.sin(y_pos * div), np.cos(y_pos * div),
                                   d_model))


def add_sine_pe_norm(x: jnp.ndarray, max_shape: Tuple[int, int]) -> jnp.ndarray:
    """x: [B, H, W, C] -> x + PE (broadcast over batch)."""
    _, h, w, c = x.shape
    return x + sine_pe_norm(c, h, w, max_shape=max_shape)[None].astype(x.dtype)


def pe_sine_interpolation(embed_dim: int, h: int, w: int,
                          grid_size: Tuple[int, int] = (48, 48),
                          temperature: float = 10000.0) -> jnp.ndarray:
    """PESineInterpolation (reference: position_encoding.py:89-123): fixed
    sin/cos embedding built on ``grid_size`` then bicubic-resized to (h, w).
    Channel layout [sin_w | cos_w | sin_h | cos_h] each embed_dim//4 wide.
    Returns [H, W, C]."""
    assert embed_dim % 4 == 0
    gh, gw = grid_size
    grid_w, grid_h = np.meshgrid(np.arange(gw, dtype=np.float32),
                                 np.arange(gh, dtype=np.float32),
                                 indexing="ij")
    pos_dim = embed_dim // 4
    omega = 1.0 / (temperature
                   ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
    out_w = np.einsum("m,d->md", grid_w.ravel(), omega)
    out_h = np.einsum("m,d->md", grid_h.ravel(), omega)
    emb = np.concatenate([np.sin(out_w), np.cos(out_w),
                          np.sin(out_h), np.cos(out_h)], axis=1)
    emb = emb.reshape(gh, gw, embed_dim)
    if (gh, gw) != (h, w):
        import jax
        emb = np.asarray(jax.image.resize(jnp.asarray(emb), (h, w, embed_dim),
                                          method="bicubic"))
    return jnp.asarray(emb.astype(np.float32))
