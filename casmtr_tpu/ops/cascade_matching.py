"""Cascade-level windowed one-sided softmax matching with static shapes.

Functional equivalent of the reference ``CascadeMatching``
(reference: src/model/functions/cascade_matching.py:35-331): the K3 gathered
window score + softmax, reverse-direction double check, the test-time
filtering chain (post-process -> previous-stage confidence gates), window
border masks, and the training-time window-label conversion — all with
fixed-capacity top-M extraction.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from casmtr_tpu.ops import nms
from casmtr_tpu.ops.gather_ops import window_score
from casmtr_tpu.ops.image_ops import resize_nearest
from casmtr_tpu.ops.matching import grid_to_pixels, select_topm, valid_extent
from casmtr_tpu.structs import Matches

INF = 1e9


class WindowSoftmaxResult(NamedTuple):
    conf01: jnp.ndarray       # [B, L0, Kw]
    conf10: jnp.ndarray       # [B, L1, Kw]
    next_idx_c01: jnp.ndarray  # [B, L0] int32 global idx into L1
    next_idx_c10: jnp.ndarray  # [B, L1]
    next_conf_c01: jnp.ndarray
    next_conf_c10: jnp.ndarray
    next_local_c01: jnp.ndarray  # [B, L0] int32 window-local argmax
    # max PRE-softmax sim per query: the detector heatmap fallback uses
    # logits, not probabilities (reference cascade_matching.py:134-136)
    max_sim_c01: Optional[jnp.ndarray] = None
    # second-best window softmax (the reference declares these at
    # cascade_matching.py:130 but never computes them — see
    # matching.DualSoftmaxResult): computed on request for the rt gate
    next_conf_c01_s: Optional[jnp.ndarray] = None  # [B, L0]
    next_idx_c01_s: Optional[jnp.ndarray] = None   # [B, L0] global idx


def _structured_score(f0, f1, corners, hw0, hw1, prop_w: int):
    """Window scores via the Pallas patch kernel (TPU) or its jnp oracle:
    queries 2x2-blocked per parent, candidates = the (2w x 2w) image1 patch
    at the parent's corner. Equals window_score(f0, f1, idx) for the standard
    'window' propagation with dilation 1."""
    from casmtr_tpu.ops.quadtree import block_children, unblock_children

    B, L0, C = f0.shape
    h0, w0 = hw0
    h1, w1 = hw1
    q_blk = block_children(f0, h0, w0)                     # [B, P, 4, C]
    f1_2d = f1.reshape(B, h1, w1, C)
    # Mosaic only lowers the kernel's unaligned patch DMA for a feature dim
    # of EXACTLY one f32 lane tile (probed on device 2026-08-19; see
    # window_kernels.py) — other widths (e.g. the 2c recipe's d_model 64)
    # take the jnp gather path
    on_tpu = jax.devices()[0].platform == "tpu" and C == 128
    if on_tpu:
        from casmtr_tpu.ops.pallas.window_kernels import \
            window_patch_score_pallas
        s = window_patch_score_pallas(q_blk, f1_2d, corners, prop_w)
    else:
        from casmtr_tpu.ops.pallas.window_kernels import \
            window_patch_score_jnp
        s = window_patch_score_jnp(q_blk, f1_2d, corners, prop_w)
    return unblock_children(s, h0 // 2, w0 // 2)           # [B, L0, 4w^2]


def window_softmax_matching(feat0, feat1, idx_c01, idx_c10, temperature: float,
                            mask0=None, mask1=None, corners0=None,
                            corners1=None, hw0=None, hw1=None,
                            prop_window: int = 0,
                            track_second: bool = False) -> WindowSoftmaxResult:
    """Window-restricted softmax both directions
    (reference cascade_matching.py:87-149; the 1->0 direction is detached).

    feat0: [B, L0, C]; feat1: [B, L1, C]; idx_c01: [B, L0, Kw] int32.
    mask0/1: [B, L] flat padding masks. When the candidate sets are
    structured patches (corners given), the Pallas patch kernel replaces the
    scalar-bound XLA gather.
    """
    c = feat0.shape[-1]
    f0 = feat0.astype(jnp.float32) / (c ** 0.5)
    f1 = feat1.astype(jnp.float32) / (c ** 0.5)

    structured = corners0 is not None and prop_window > 0
    if structured:
        sim01 = _structured_score(f0, f1, corners0, hw0, hw1,
                                  prop_window) / temperature
    else:
        # checkpoint: the gathered [B, L0, Kw, C] tensor inside window_score
        # is a 1.5 GB autodiff residual at 704^2 (recompute it in backward)
        sim01 = jax.checkpoint(window_score)(f0, f1, idx_c01) / temperature
    if mask0 is not None and mask1 is not None:
        wmask0 = jnp.take_along_axis(
            jnp.broadcast_to(mask1[:, None], (mask1.shape[0],
                                              idx_c01.shape[1],
                                              mask1.shape[1])), idx_c01, axis=2)
        wmask0 = (wmask0 * mask0[:, :, None]) > 0
        sim01 = jnp.where(wmask0, sim01, -INF)
    conf01 = jax.nn.softmax(sim01, axis=2)

    if structured:
        sim10 = jax.lax.stop_gradient(
            _structured_score(f1, f0, corners1, hw1, hw0,
                              prop_window)) / temperature
    else:
        sim10 = jax.lax.stop_gradient(
            window_score(f1, f0, idx_c10)) / temperature
    if mask0 is not None and mask1 is not None:
        wmask1 = jnp.take_along_axis(
            jnp.broadcast_to(mask0[:, None], (mask0.shape[0],
                                              idx_c10.shape[1],
                                              mask0.shape[1])), idx_c10, axis=2)
        wmask1 = (wmask1 * mask1[:, :, None]) > 0
        sim10 = jnp.where(wmask1, sim10, -INF)
    conf10 = jax.nn.softmax(sim10, axis=2)

    local01 = conf01.argmax(axis=2).astype(jnp.int32)
    next_conf01 = jnp.take_along_axis(conf01, local01[..., None], 2)[..., 0]
    next_idx01 = jnp.take_along_axis(idx_c01, local01[..., None], 2)[..., 0]
    local10 = conf10.argmax(axis=2).astype(jnp.int32)
    next_conf10 = jnp.take_along_axis(conf10, local10[..., None], 2)[..., 0]
    next_idx10 = jnp.take_along_axis(idx_c10, local10[..., None], 2)[..., 0]
    next_conf01_s = next_idx01_s = None
    if track_second:
        k = jnp.arange(conf01.shape[2], dtype=jnp.int32)[None, None]
        conf01_wo = jnp.where(k == local01[..., None], -1.0, conf01)
        local01_s = conf01_wo.argmax(axis=2).astype(jnp.int32)
        next_conf01_s = jnp.take_along_axis(conf01_wo,
                                            local01_s[..., None], 2)[..., 0]
        next_idx01_s = jnp.take_along_axis(idx_c01,
                                           local01_s[..., None], 2)[..., 0]
    return WindowSoftmaxResult(conf01, conf10, next_idx01, next_idx10,
                               next_conf01, next_conf10, local01,
                               max_sim_c01=jnp.max(sim01, axis=2),
                               next_conf_c01_s=next_conf01_s,
                               next_idx_c01_s=next_idx01_s)


def window_border_ok(next_idx_c01, hw0, hw1, bd: int,
                     mask0_2d=None, mask1_2d=None) -> jnp.ndarray:
    """Border validity of (source position, matched target position)
    (reference cascade_functions.py:120-172 mask_window_border[_with_padding]).

    Note the reference masks only the NEAR borders (:b) plus per-sample far
    borders when padding masks exist; without masks it also trims the far grid
    edge. Target test uses strict compare (x < b or x > W1 - b)."""
    B, L0 = next_idx_c01.shape
    h0, w0 = hw0
    h1, w1 = hw1
    if bd <= 0:
        return jnp.ones((B, L0), bool)
    i = jnp.arange(L0, dtype=jnp.int32)
    r0 = (i // w0)[None]
    c0 = (i % w0)[None]
    ty = next_idx_c01 // w1
    tx = next_idx_c01 % w1
    ok = (r0 >= bd) & (c0 >= bd)
    if mask0_2d is not None:
        h0s, w0s = valid_extent(mask0_2d)
        h1s, w1s = valid_extent(mask1_2d)
        ok &= (r0 < h0s[:, None] - bd) & (c0 < w0s[:, None] - bd)
        ok &= ~((tx < bd) | (tx > w1s[:, None] - bd)
                | (ty < bd) | (ty > h1s[:, None] - bd))
    else:
        ok &= (r0 < h0 - bd) & (c0 < w0 - bd)
        ok &= ~((tx < bd) | (tx > w1 - bd) | (ty < bd) | (ty > h1 - bd))
    return ok


def upscale_per_position(field: jnp.ndarray, hw_src, hw_dst) -> jnp.ndarray:
    """[B, L_src] -> [B, L_dst] nearest upsampling of a per-position field
    (reference cascade_matching.py:202-205 F.interpolate nearest)."""
    B = field.shape[0]
    f = field.reshape(B, hw_src[0], hw_src[1], 1).astype(jnp.float32)
    f = resize_nearest(f, hw_dst[0], hw_dst[1])
    return f.reshape(B, -1)


def cascade_match_mask_test(
        ws: WindowSoftmaxResult, hw0, hw1, test_thr: float, bd: int,
        pre_confs: Sequence[jnp.ndarray], pre_hws: Sequence[Tuple[int, int]],
        pre_thrs: Sequence[float], post_method: Optional[str],
        post_window: Optional[int], post_topk: Optional[int] = None,
        double_check: bool = True, mask0_2d=None, mask1_2d=None,
        s_d2d=None, d2d_w=None,
        post_temperature: float = 1.0, post_stride: int = 1,
        rt: Optional[float] = None, rd: Optional[float] = None,
        pre_confs_s: Optional[Sequence[jnp.ndarray]] = None,
        rd_coarse: Optional[Tuple[jnp.ndarray, jnp.ndarray,
                                  Tuple[int, int]]] = None,
        image0: Optional[jnp.ndarray] = None,
        image0_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Test-time filtering chain (reference cascade_matching.py:191-251).

    ``rt``/``rd`` gates (reference :193-231): the reference DECLARES these in
    config (default.py POST_CONFIG.RT/RD, both None in every released recipe)
    and consumes them here, but the ``next_{conf,idx}_c01_s`` second-best
    tensors they read are set to None at every producer
    (coarse_matching.py:74, cascade_matching.py:130) — enabling them crashes
    the reference. This build completes the intended plumbing: ``rt`` drops a
    match when second_best/best confidence exceeds it (at this level AND at
    every pre level, nearest-upsampled); ``rd`` drops it when the normalized
    distance between the coarse (8c) best and second-best targets exceeds it.
    ``pre_confs_s`` parallels ``pre_confs``; ``rd_coarse`` is
    (idx_c01_8c, idx_c01_s_8c, hw_8c).
    """
    mask = nms.post_process_mask(post_method, ws.next_conf_c01, hw0, test_thr,
                                 window=post_window, topk=post_topk,
                                 s_d2d=s_d2d, d2d_w=d2d_w,
                                 temperature=post_temperature,
                                 stride=post_stride, image0=image0,
                                 image0_mask=image0_mask)
    if rt is not None:
        ts = ws.next_conf_c01_s / (ws.next_conf_c01 + 1e-7)
        mask &= ~(ts > rt)
    for i, (pre_conf, pre_hw, pre_thr) in enumerate(
            zip(pre_confs, pre_hws, pre_thrs)):
        up = upscale_per_position(pre_conf, pre_hw, hw0)
        mask &= up > pre_thr
        if rt is not None:
            up_s = upscale_per_position(pre_confs_s[i], pre_hw, hw0)
            mask &= ~(up_s / (up + 1e-7) > rt)
    if rd is not None:
        # reference :216-231, applied only for the '8c' pre level: distance
        # between the best and second-best coarse targets in grid-normalized
        # xy, nearest-upsampled to this level
        idx8, idx8_s, (h8, w8) = rd_coarse
        x = (idx8 % w8).astype(jnp.float32) / w8
        y = (idx8 // w8).astype(jnp.float32) / h8
        xs = (idx8_s % w8).astype(jnp.float32) / w8
        ys = (idx8_s // w8).astype(jnp.float32) / h8
        dist = jnp.sqrt((x - xs) ** 2 + (y - ys) ** 2)
        mask &= ~(upscale_per_position(dist, (h8, w8), hw0) > rd)
    return _mask_common_tail(ws, mask, hw0, hw1, bd, double_check,
                             mask0_2d, mask1_2d)


def _mask_common_tail(ws, mask, hw0, hw1, bd, double_check, mask0_2d,
                      mask1_2d):
    """Border mask + cycle double-check + keep-at-least-one — the reference
    applies these in BOTH the train and test branches (cascade_matching.py
    :233-242 border, :244-251 double-check, :254-255 保底, all at method
    level after the branch-specific thresholding)."""
    mask &= window_border_ok(ws.next_idx_c01, hw0, hw1, bd, mask0_2d, mask1_2d)
    if double_check:
        L0 = ws.next_idx_c01.shape[1]
        arange = jnp.arange(L0, dtype=jnp.int32)[None]
        back = jnp.take_along_axis(ws.next_idx_c10, ws.next_idx_c01, axis=1)
        mask &= back == arange
    return keep_at_least_one(mask)


def keep_at_least_one(mask: jnp.ndarray) -> jnp.ndarray:
    """If the whole batch filtered to nothing, force-keep position 0 of every
    row (reference cascade_matching.py:254-255 '保底一个' — guards the empty
    fine stage downstream)."""
    empty = ~jnp.any(mask)
    return mask.at[:, 0].set(mask[:, 0] | empty)


def cascade_match_mask_train(ws: WindowSoftmaxResult, thr: float,
                             n_cands: int, hw0=None, hw1=None, bd: int = 0,
                             double_check: bool = False, mask0_2d=None,
                             mask1_2d=None) -> jnp.ndarray:
    """Training-time thresholding (reference cascade_matching.py:186-190):
    confidences above uniform (1/Kw) when thr > 0, else above thr — followed
    by the same border/double-check/keep-one tail as the test path (the
    reference applies them in both branches)."""
    if thr > 0:
        mask = ws.next_conf_c01 > (1.0 / n_cands)
    else:
        mask = ws.next_conf_c01 > thr
    if hw0 is None:
        return keep_at_least_one(mask)
    return _mask_common_tail(ws, mask, hw0, hw1, bd, double_check,
                             mask0_2d, mask1_2d)


def extract_cascade_matches(ws: WindowSoftmaxResult, mask: jnp.ndarray,
                            hw0, hw1, m_cap: int, scale: float,
                            scale0=None, scale1=None,
                            priority: Optional[jnp.ndarray] = None,
                            idx_c01: Optional[jnp.ndarray] = None,
                            gt_idx_c01: Optional[jnp.ndarray] = None,
                            gt_mask_c01: Optional[jnp.ndarray] = None):
    """Fixed-capacity extraction (replaces reference :254-329).

    In training mode (gt_idx_c01 given) only positions whose ground-truth
    target lies inside the candidate window are selected (the reference's
    ``window_gt_label.sum(-1) == 1`` filter + random subsample to
    train_pad_num_gt_min, realized here as priority-ordered top-M), and the
    per-match window labels are returned alongside.
    """
    B, L0 = ws.next_conf_c01.shape
    h0, w0 = hw0

    window_gt = None
    if gt_idx_c01 is not None:
        # [B, L0, Kw] one-hot of the gt target within the candidate window
        window_gt = (gt_idx_c01[..., None] == idx_c01)
        window_gt &= gt_mask_c01[..., None]
        has_gt = window_gt.sum(-1) == 1
        mask = mask & has_gt

    prio = ws.next_conf_c01 if priority is None else priority
    sel, valid = select_topm(mask.reshape(-1), prio.reshape(-1), m_cap)
    b_ids = (sel // L0).astype(jnp.int32)
    i_ids = (sel % L0).astype(jnp.int32)
    j_ids = ws.next_idx_c01.reshape(-1)[sel]
    mconf = jnp.where(valid, ws.next_conf_c01.reshape(-1)[sel], 0.0)

    s0 = scale0[b_ids] if scale0 is not None else None
    s1 = scale1[b_ids] if scale1 is not None else None
    mkpts0 = grid_to_pixels(i_ids, w0, scale, s0)
    mkpts1 = grid_to_pixels(j_ids, hw1[1], scale, s1)
    matches = Matches(b_ids=b_ids, i_ids=i_ids, j_ids=j_ids, mconf=mconf,
                      valid=valid, mkpts0=mkpts0, mkpts1=mkpts1)

    extras = {}
    if window_gt is not None:
        Kw = idx_c01.shape[-1]
        extras["window_gt_label"] = window_gt.reshape(-1, Kw)[sel]
        extras["window_conf"] = ws.conf01.reshape(-1, Kw)[sel]
    return matches, extras


def detect_keypoints(heatmap0, conf01, mode: str, grid_size: int,
                     rng_key=None):
    """Grid-wise hard keypoint selection with straight-through gradients
    (reference cascade_functions.py:175-199): the heatmap is split into
    grid_size x grid_size cells; one position per cell is selected (gumbel or
    deterministic argmax), and the conf matrix rows of unselected positions
    are zeroed (gradients pass through the soft selection).

    heatmap0: [B, H, W]; conf01: [B, H*W, K]. Returns [B, H*W, K]."""
    B, H, W = heatmap0.shape
    K = conf01.shape[-1]
    g = grid_size
    cells = heatmap0.reshape(B, H // g, g, W // g, g)
    cells = jnp.moveaxis(cells, 2, 3).reshape(B, (H // g) * (W // g), g * g)
    if mode == "gumbel":
        assert rng_key is not None, "gumbel detector needs an rng key"
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(rng_key, cells.shape, minval=1e-9,
                               maxval=1.0) + 1e-9))
        logits = cells + gumbel
    elif mode == "ST":
        logits = cells
    else:
        raise NotImplementedError(mode)
    soft = jax.nn.softmax(logits, axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(soft, -1), g * g, dtype=soft.dtype)
    sel = hard - jax.lax.stop_gradient(soft) + soft      # straight-through
    sel = sel.reshape(B, H // g, W // g, g, g)
    sel = jnp.moveaxis(sel, 3, 2).reshape(B, H * W)
    return conf01 * sel[..., None]


def select_detector_labels(detector_matrix, base_mask, idx_c01, gt_idx_c01,
                           gt_mask_c01, m_cap: int):
    """Fixed-capacity selection of detector-branch window labels
    (reference cascade_matching.py:288-314): positions whose detector conf
    exceeds uniform AND pass the base training mask AND have their gt inside
    the window."""
    B, L0, Kw = detector_matrix.shape
    det_conf = detector_matrix.max(axis=2)
    mask = base_mask & (det_conf > 1.0 / Kw)
    window_gt = (gt_idx_c01[..., None] == idx_c01) & gt_mask_c01[..., None]
    mask &= window_gt.sum(-1) == 1
    sel, valid = select_topm(mask.reshape(-1), det_conf.reshape(-1), m_cap)
    return (window_gt.reshape(-1, Kw)[sel],
            detector_matrix.reshape(-1, Kw)[sel], valid)
