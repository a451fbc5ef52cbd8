"""Fine-level window extraction and sub-pixel matching.

Functional equivalents of the reference ``CascadeFinePreprocess`` /
``CascadeFineMatching`` (reference: src/model/functions/fine_matching.py:14-137).
The reference unfolds the whole fine feature map then gathers M windows; here
we gather the M fixed-capacity windows directly (cheaper, static shapes).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from casmtr_tpu.structs import Matches


def extract_windows(feat: jnp.ndarray, b_ids: jnp.ndarray,
                    center_flat: jnp.ndarray, hw_c: Tuple[int, int],
                    stride: int, w_size: int) -> jnp.ndarray:
    """Gather [M, W*W, C] windows from [B, Hf, Wf, C] centred at coarse-grid
    positions (torch ``F.unfold(kernel=W, stride=stride, padding=W//2)``
    places window centres at (r*stride, c*stride); reference
    fine_matching.py:48-55). Out-of-bounds taps are zero.
    """
    B, Hf, Wf, C = feat.shape
    hc, wc = hw_c
    r = (center_flat // wc) * stride   # [M]
    c = (center_flat % wc) * stride
    off = jnp.arange(w_size, dtype=jnp.int32) - w_size // 2
    rows = r[:, None] + off[None, :]   # [M, W]
    cols = c[:, None] + off[None, :]
    in_b = ((rows >= 0) & (rows < Hf))[:, :, None] & \
           ((cols >= 0) & (cols < Wf))[:, None, :]      # [M, W, W]
    rows_c = jnp.clip(rows, 0, Hf - 1)
    cols_c = jnp.clip(cols, 0, Wf - 1)
    win = feat[b_ids[:, None, None], rows_c[:, :, None], cols_c[:, None, :]]
    win = jnp.where(in_b[..., None], win, 0.0)          # [M, W, W, C]
    return win.reshape(win.shape[0], w_size * w_size, C)


class FineWindows(NamedTuple):
    feat0: jnp.ndarray   # [M, W*W, Cf]
    feat1: jnp.ndarray   # [M, W*W, Cf]


def spatial_expectation(heatmap: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmax over [M, W, W] -> normalized (x, y) in [-1, 1]
    (kornia dsnt.spatial_expectation2d parity; reference :112)."""
    M, W, _ = heatmap.shape
    grid = jnp.linspace(-1.0, 1.0, W)
    ex = jnp.einsum("mhw,w->m", heatmap, grid)
    ey = jnp.einsum("mhw,h->m", heatmap, grid)
    return jnp.stack([ex, ey], axis=-1)


class FineResult(NamedTuple):
    expec_f: jnp.ndarray    # [M, 3] (dx, dy, std)
    coords_norm: jnp.ndarray  # [M, 2]


def fine_match(feat0_win: jnp.ndarray, feat1_win: jnp.ndarray) -> FineResult:
    """Centre-pixel vs window correlation -> softmax heatmap -> soft-argmax +
    std (reference fine_matching.py:106-120)."""
    M, WW, C = feat0_win.shape
    W = int(WW ** 0.5)
    f0c = feat0_win[:, WW // 2]                       # [M, C]
    sim = jnp.einsum("mc,mrc->mr", f0c.astype(jnp.float32),
                     feat1_win.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    heat = jax.nn.softmax(sim / (C ** 0.5), axis=1).reshape(M, W, W)

    coords = spatial_expectation(heat)                # [M, 2] in [-1, 1]
    grid = jnp.linspace(-1.0, 1.0, W)
    gx = jnp.broadcast_to(grid[None, None, :], (1, W, W)).reshape(1, WW)
    gy = jnp.broadcast_to(grid[None, :, None], (1, W, W)).reshape(1, WW)
    g2 = jnp.stack([gx, gy], axis=-1) ** 2            # [1, WW, 2]
    var = jnp.einsum("mr,qrc->mc", heat.reshape(M, WW), g2) - coords ** 2
    std = jnp.sqrt(jnp.clip(var, 1e-10)).sum(axis=-1)  # [M]
    return FineResult(jnp.concatenate([coords, std[:, None]], axis=-1), coords)


def fine_keypoints(matches: Matches, coords_norm: jnp.ndarray, w_size: int,
                   scale_f: float, scale1=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Absolute sub-pixel keypoints (reference fine_matching.py:125-137):
    mkpts1_f = mkpts1_c + coords_norm * (W//2) * scale; mkpts0 unchanged.

    scale_f: fine-grid stride in model pixels; scale1: optional [M, 2]
    original-image resize factors."""
    delta = coords_norm * (w_size // 2) * scale_f
    if scale1 is not None:
        delta = delta * scale1
    return matches.mkpts0, matches.mkpts1 + delta
