"""Coarse dual-softmax matching with static-shape match extraction.

Functional equivalent of the reference ``CoarseMatching``
(reference: src/model/functions/coarse_matching.py:21-153) with the
variable-length ``torch.where`` extraction replaced by a fixed-capacity
top-M selection (validity-masked; SURVEY.md §7 delta 2).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from casmtr_tpu.structs import Matches

INF = 1e9


class DualSoftmaxResult(NamedTuple):
    conf_matrix: jnp.ndarray    # [B, L0, L1]
    next_idx_c01: jnp.ndarray   # [B, L0] int32
    next_idx_c10: jnp.ndarray   # [B, L1] int32
    next_conf_c01: jnp.ndarray  # [B, L0]
    next_conf_c10: jnp.ndarray  # [B, L1]
    # second-best row softmax (the reference DECLARES these —
    # coarse_matching.py:74 ``next_conf_c01_s`` — but always leaves them
    # None, so its rt/rd gates crash if ever enabled; here they are computed
    # on request, feeding the cascade ratio/distance gates)
    next_conf_c01_s: Optional[jnp.ndarray] = None  # [B, L0]
    next_idx_c01_s: Optional[jnp.ndarray] = None   # [B, L0] int32


def dual_softmax(feat0: jnp.ndarray, feat1: jnp.ndarray, temperature: float,
                 mask0: Optional[jnp.ndarray] = None,
                 mask1: Optional[jnp.ndarray] = None,
                 track_second: bool = False) -> DualSoftmaxResult:
    """Dual-softmax confidence (reference: coarse_matching.py:62-84).

    feat0: [B, L0, C]; feat1: [B, L1, C]; masks [B, L] (1 = valid).
    Features are L2-style normalized by sqrt(C) before the similarity, and the
    similarity is divided by ``temperature`` (T=0.1 default).
    ``track_second`` additionally records the second-best row softmax
    confidence/index (only needed by the cascade rt/rd test gates; off by
    default to keep the standard graph unchanged).
    """
    c = feat0.shape[-1]
    f0 = feat0.astype(jnp.float32) / (c ** 0.5)
    f1 = feat1.astype(jnp.float32) / (c ** 0.5)
    sim = jnp.einsum("blc,bsc->bls", f0, f1,
                     precision=jax.lax.Precision.HIGHEST) / temperature
    if mask0 is not None and mask1 is not None:
        valid = (mask0[:, :, None] * mask1[:, None, :]) > 0
        sim = jnp.where(valid, sim, -INF)
    sm10 = jax.nn.softmax(sim, axis=1)   # over L0 (column softmax)
    sm01 = jax.nn.softmax(sim, axis=2)   # over L1 (row softmax)
    conf = sm10 * sm01

    next_conf_c01 = sm01.max(axis=2)
    next_idx_c01 = sm01.argmax(axis=2).astype(jnp.int32)
    next_conf_c10 = sm10.max(axis=1)
    next_idx_c10 = sm10.argmax(axis=1).astype(jnp.int32)
    next_conf_c01_s = next_idx_c01_s = None
    if track_second:
        # re-max with the best column knocked out (softmax values are >= 0,
        # so -1 never wins); XLA fuses the where into the reduction
        j = jnp.arange(sm01.shape[2], dtype=jnp.int32)[None, None]
        sm01_wo = jnp.where(j == next_idx_c01[..., None], -1.0, sm01)
        next_conf_c01_s = sm01_wo.max(axis=2)
        next_idx_c01_s = sm01_wo.argmax(axis=2).astype(jnp.int32)
    return DualSoftmaxResult(conf, next_idx_c01, next_idx_c10,
                             next_conf_c01, next_conf_c10,
                             next_conf_c01_s, next_idx_c01_s)


def _border_ok(rows, cols, bd, h, w, h_valid=None, w_valid=None):
    """Positions at least ``bd`` away from every border are kept.

    Without padding masks the far border is the grid edge (reference
    cascade_functions.py:82-99 sets m[:, :b] and m[:, -b:]); with padding the
    far border is the per-sample valid extent (``[..., h0s-bd:] = False``,
    reference cascade_functions.py:102-117)."""
    if bd <= 0:
        return jnp.ones_like(rows, dtype=bool)
    hh = h - bd if h_valid is None else h_valid - bd
    ww = w - bd if w_valid is None else w_valid - bd
    return (rows >= bd) & (cols >= bd) & (rows < hh) & (cols < ww)


def valid_extent(mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample valid (h, w) from a padded-region mask [B, H, W]
    (reference coarse_matching.py:15-16)."""
    m = mask.astype(jnp.int32)
    hs = m.sum(axis=1).max(axis=-1)
    ws = m.sum(axis=2).max(axis=-1)
    return hs, ws


def select_topm(mask_flat: jnp.ndarray, conf_flat: jnp.ndarray, m_cap: int):
    """Select the top-``m_cap`` valid entries by confidence from flattened
    [N] arrays. Returns (indices [M], valid [M]); slots beyond N (when the
    capacity exceeds the candidate count) are invalid."""
    n = mask_flat.shape[0]
    k = min(m_cap, n)
    score = jnp.where(mask_flat, conf_flat, -jnp.inf)
    # exact_topk: avoids lax.top_k's full-sort lowering on TPU (values
    # exact; tie order is the pinned device semantics, see quadtree.py)
    from casmtr_tpu.ops.quadtree import exact_topk
    vals, idx = exact_topk(score[None], k)
    vals, idx = vals[0], idx[0]
    valid = jnp.isfinite(vals)
    if k < m_cap:
        idx = jnp.pad(idx, (0, m_cap - k))
        valid = jnp.pad(valid, (0, m_cap - k))
    return idx.astype(jnp.int32), valid


def grid_to_pixels(flat_idx, w, scale, scale_xy=None):
    """Flat grid index -> (x, y) original-image pixels.

    scale: grid stride in model-input pixels; scale_xy: optional [.., 2]
    resize factors (data['scale0/1']) mapping model pixels to original pixels
    (reference coarse_matching.py:138-142)."""
    x = (flat_idx % w).astype(jnp.float32)
    y = (flat_idx // w).astype(jnp.float32)
    pts = jnp.stack([x, y], axis=-1) * scale
    if scale_xy is not None:
        pts = pts * scale_xy
    return pts


def extract_coarse_matches(
        conf_matrix: jnp.ndarray, thr: float, border_rm: int,
        hw0: Tuple[int, int], hw1: Tuple[int, int], m_cap: int,
        scale: float,
        mask0: Optional[jnp.ndarray] = None,
        mask1: Optional[jnp.ndarray] = None,
        scale0: Optional[jnp.ndarray] = None,
        scale1: Optional[jnp.ndarray] = None) -> Matches:
    """Static-shape analogue of reference ``get_coarse_match``
    (coarse_matching.py:91-153): threshold + border removal + mutual-nearest
    check, then fixed-capacity top-M selection ordered by confidence.

    conf_matrix: [B, L0, L1]; mask0/1: optional [B, h, w] padding masks at this
    level; scale0/1: optional [B, 2] original-image resize factors.
    """
    B, L0, L1 = conf_matrix.shape
    h0, w0 = hw0
    h1, w1 = hw1

    keep = conf_matrix > thr
    # mutual nearest (reference :125)
    keep &= conf_matrix == conf_matrix.max(axis=2, keepdims=True)
    keep &= conf_matrix == conf_matrix.max(axis=1, keepdims=True)

    # exclude padded positions outright (the reference relies on -INF fill +
    # threshold, which breaks down for fully-masked rows where the softmax
    # degenerates to uniform; masking here is the static-shape-safe version)
    if mask0 is not None and mask1 is not None:
        keep &= (mask0.reshape(B, L0)[:, :, None] > 0)
        keep &= (mask1.reshape(B, L1)[:, None, :] > 0)

    # border removal on both grids (reference :117-122)
    if border_rm > 0:
        i = jnp.arange(L0, dtype=jnp.int32)
        j = jnp.arange(L1, dtype=jnp.int32)
        if mask0 is not None:
            h0s, w0s = valid_extent(mask0)
            h1s, w1s = valid_extent(mask1)
            ok0 = _border_ok(i[None] // w0, i[None] % w0, border_rm, h0, w0,
                             h0s[:, None], w0s[:, None])
            ok1 = _border_ok(j[None] // w1, j[None] % w1, border_rm, h1, w1,
                             h1s[:, None], w1s[:, None])
        else:
            ok0 = _border_ok(i[None] // w0, i[None] % w0, border_rm, h0, w0)
            ok1 = _border_ok(j[None] // w1, j[None] % w1, border_rm, h1, w1)
        keep &= ok0[:, :, None] & ok1[:, None, :]

    # row-wise best j (at most one True per row after mutual check)
    mask_v = keep.any(axis=2)                                 # [B, L0]
    j_ids_row = keep.argmax(axis=2).astype(jnp.int32)         # [B, L0]
    conf_row = jnp.take_along_axis(conf_matrix, j_ids_row[..., None],
                                   axis=2)[..., 0]            # [B, L0]

    sel, valid = select_topm(mask_v.reshape(-1), conf_row.reshape(-1), m_cap)
    b_ids = (sel // L0).astype(jnp.int32)
    i_ids = (sel % L0).astype(jnp.int32)
    j_ids = j_ids_row.reshape(-1)[sel]
    mconf = jnp.where(valid, conf_row.reshape(-1)[sel], 0.0)

    s0 = scale0[b_ids] if scale0 is not None else None
    s1 = scale1[b_ids] if scale1 is not None else None
    mkpts0 = grid_to_pixels(i_ids, w0, scale, s0)
    mkpts1 = grid_to_pixels(j_ids, w1, scale, s1)
    return Matches(b_ids=b_ids, i_ids=i_ids, j_ids=j_ids, mconf=mconf,
                   valid=valid, mkpts0=mkpts0, mkpts1=mkpts1)
