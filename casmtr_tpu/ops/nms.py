"""Test-time keypoint filtering / NMS (reference: src/model/functions/
post_processing.py:35-147).

``maxpool_nms`` (the released-model default) keeps a position iff it is the
argmax of the window centred on it, with torch ``F.max_pool2d(return_indices)``
first-index tie-breaking reproduced via a static scan over window offsets.
The 'sift' variant dispatches to the TPU-native scale-space blob detector
(ops/sift.py; the reference uses kornia's ScaleSpaceDetector — deviations
documented there; no released recipe enables it).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def maxpool_nms_mask(conf: jnp.ndarray, hw: Tuple[int, int], window: int
                     ) -> jnp.ndarray:
    """[B, L] -> [B, L] bool: position is its own centred-window argmax
    (reference post_processing.py:111-121)."""
    B = conf.shape[0]
    h, w = hw
    c2 = conf.reshape(B, h, w)
    pad = window // 2
    best_val = jnp.full_like(c2, -jnp.inf)
    best_idx = jnp.zeros_like(c2, dtype=jnp.int32)
    base = (jnp.arange(h)[:, None] * w + jnp.arange(w)[None, :]).astype(jnp.int32)
    cp = jnp.pad(c2, ((0, 0), (pad, pad), (pad, pad)),
                 constant_values=-jnp.inf)
    ip = jnp.pad(jnp.broadcast_to(base[None], (B, h, w)),
                 ((0, 0), (pad, pad), (pad, pad)), constant_values=0)
    # scan offsets in kernel row-major order; strict > keeps the FIRST max
    for dy in range(window):
        for dx in range(window):
            v = cp[:, dy:dy + h, dx:dx + w]
            i = ip[:, dy:dy + h, dx:dx + w]
            take = v > best_val
            best_val = jnp.where(take, v, best_val)
            best_idx = jnp.where(take, i, best_idx)
    return (best_idx == base[None]).reshape(B, -1)


def local_window_nms_mask(conf: jnp.ndarray, hw: Tuple[int, int], window: int,
                          topk: int) -> jnp.ndarray:
    """Keep top-k per non-overlapping window (reference :76-92)."""
    B = conf.shape[0]
    h, w = hw
    c = conf.reshape(B, h // window, window, w // window, window)
    c = jnp.moveaxis(c, 2, 3).reshape(B, -1, window * window)
    nw = c.shape[1]
    # 2-D operand: >2-D top_k hits the TPU layout pathology (see exact_topk)
    from casmtr_tpu.ops.quadtree import exact_topk
    _, top_i = exact_topk(c.reshape(B * nw, window * window), topk)
    top_i = top_i.reshape(B, nw, topk)               # [B, nW, k] local idx
    oneh = jax.nn.one_hot(top_i, window * window, dtype=jnp.bool_).any(axis=2)
    oneh = oneh.reshape(B, h // window, w // window, window, window)
    oneh = jnp.moveaxis(oneh, 3, 2).reshape(B, h * w)
    return oneh


def softargmax_nms_mask(conf: jnp.ndarray, hw: Tuple[int, int], window: int,
                        temperature: float = 1.0, stride: int = 1
                        ) -> jnp.ndarray:
    """Sliding-window soft-argmax keypoint selection (reference
    post_processing.py:93-110, kornia ConvSoftArgmax2d semantics): every
    window votes for its softmax-expected position (zero-padded borders
    participate in the softmax, as kornia's conv padding does); a position
    is kept iff at least one window's rounded expectation lands on it.

    NOTE on the reference: it indexes kornia's (x, y)-ordered coords as
    ``coords[:, 0] * w0c + coords[:, 1]`` — an x/y transposition that only
    coincides with any geometric meaning on square grids. We implement the
    geometric intent (flat index = y * w + x), clamped in-bounds; no
    released recipe uses this method (kornia-dependent, configs set
    maxpool_nms), so there is no behavior to bit-match and kornia is not
    installable here to compare against.
    """
    B = conf.shape[0]
    h, w = hw
    assert stride in (1, window), (stride, window)  # reference :97 asserts
    c2 = conf.reshape(B, h, w)
    pad = window // 2 if stride == 1 else 0
    if stride == 1:
        cp = jnp.pad(c2, ((0, 0), (pad, pad), (pad, pad)))
        slices_v, slices_y, slices_x = [], [], []
        yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        for dy in range(window):
            for dx in range(window):
                slices_v.append(cp[:, dy:dy + h, dx:dx + w])
                slices_y.append(yy + (dy - pad))
                slices_x.append(xx + (dx - pad))
        v = jnp.stack(slices_v, axis=-1)                 # [B, h, w, k*k]
        sy = jnp.stack(slices_y, axis=-1)                # [1, h, 1, k*k]
        sx = jnp.stack(slices_x, axis=-1)                # [1, 1, w, k*k]
        p = jax.nn.softmax(v / temperature, axis=-1)
        ey = jnp.sum(p * sy, axis=-1)                    # [B, h, w]
        ex = jnp.sum(p * sx, axis=-1)
    else:  # non-overlapping tiles; partial border tiles are dropped, as a
        # stride=window, padding=0 conv would (kornia ConvSoftArgmax2d)
        hT, wT = h // window, w // window
        c4 = c2[:, :hT * window, :wT * window]
        c4 = c4.reshape(B, hT, window, wT, window)
        c4 = jnp.moveaxis(c4, 2, 3)                      # [B, hT, wT, k, k]
        p = jax.nn.softmax(
            (c4 / temperature).reshape(*c4.shape[:3], -1), axis=-1
        ).reshape(c4.shape)
        off = jnp.arange(window, dtype=jnp.float32)
        oy = (jnp.arange(h // window, dtype=jnp.float32) * window)
        ox = (jnp.arange(w // window, dtype=jnp.float32) * window)
        ey = jnp.einsum("bhwyx,y->bhw", p, off) + oy[None, :, None]
        ex = jnp.einsum("bhwyx,x->bhw", p, off) + ox[None, None, :]
    ty = jnp.clip(jnp.round(ey), 0, h - 1).astype(jnp.int32)
    tx = jnp.clip(jnp.round(ex), 0, w - 1).astype(jnp.int32)
    flat = (ty * w + tx).reshape(B, -1)                  # [B, n_windows]
    mask = jnp.zeros((B, h * w), bool)
    b_ix = jnp.broadcast_to(jnp.arange(B)[:, None], flat.shape)
    return mask.at[b_ix, flat].set(True)


def d2d_saliency(feat0: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Feature-statistics saliency S_as * S_rs computed at 1/4 of the level
    grid (reference cascade_matching.py:90-104). feat0: [B, L, C] normalized
    features. Returns [B, (h//4)*(w//4)]."""
    B, L, C = feat0.shape
    h, w = hw
    s_as = jnp.std(feat0, axis=-1).reshape(B, h, w)
    s_as = s_as[:, ::4, ::4]                          # nearest 0.25 resize
    f2d = feat0.reshape(B, h, w, C)
    # 5x5 centre-surround kernel, stride 4, per-channel
    k = jnp.full((5, 5), -1.0 / 25.0).at[2, 2].set(24.0)
    kern = jnp.broadcast_to(k[:, :, None, None], (5, 5, 1, C))
    resp = jax.lax.conv_general_dilated(
        f2d, kern, window_strides=(4, 4), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    s_rs = jnp.linalg.norm(resp, axis=-1)             # [B, h/4, w/4]
    s_rs = (s_rs - s_rs.min()) / (s_rs.max() - s_rs.min() + 1e-12)
    return (s_as * s_rs).reshape(B, -1)


def d2d_mask(conf: jnp.ndarray, hw: Tuple[int, int], window: int,
             s_d2d: jnp.ndarray, d2d_w: int) -> jnp.ndarray:
    """NMS-count-matched top-k of the saliency map, scattered to the level
    grid at 4x stride (reference post_processing.py:122-143)."""
    B, L = conf.shape
    nms = maxpool_nms_mask(conf, hw, window)
    num = nms.sum(axis=1)                               # [B]
    order = jnp.argsort(-s_d2d, axis=1)
    rank = jnp.argsort(order, axis=1)                   # rank of each pos
    sel = rank < num[:, None]                           # [B, hw/16]
    pos = jnp.arange(s_d2d.shape[1], dtype=jnp.int32)
    y4 = pos // d2d_w * 4
    x4 = pos % d2d_w * 4
    flat = y4 * (d2d_w * 4) + x4                        # [hw/16]
    mask = jnp.zeros((B, L), bool)
    mask = mask.at[:, flat].set(sel)
    return mask


def post_process_mask(method: Optional[str], conf: jnp.ndarray,
                      hw: Tuple[int, int], test_thr: float,
                      window: Optional[int] = None,
                      topk: Optional[int] = None,
                      s_d2d: Optional[jnp.ndarray] = None,
                      d2d_w: Optional[int] = None,
                      temperature: float = 1.0,
                      stride: int = 1,
                      image0: Optional[jnp.ndarray] = None,
                      image0_mask: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
    """Dispatch (reference post_processing.py:41-145). conf: [B, L]."""
    if method is None:
        return conf > test_thr
    if method == "maxpool_nms":
        m = maxpool_nms_mask(conf, hw, window)
    elif method == "local_window_nms":
        m = local_window_nms_mask(conf, hw, window, topk)
    elif method == "softargmax_nms":
        m = softargmax_nms_mask(conf, hw, window, temperature, stride)
    elif method == "d2d":
        m = d2d_mask(conf, hw, window, s_d2d, d2d_w)
    elif method == "sift":
        # keep matches whose coarse cell contains a scale-space blob
        # keypoint of image0 (reference post_processing.py:46-75; TPU
        # re-implementation + deviations documented in ops/sift.py)
        if image0 is None:
            raise ValueError("post-process 'sift' needs image0 (the model "
                             "threads it when post_config.method == 'sift')")
        from casmtr_tpu.ops.sift import sift_cell_mask
        img_stride = image0.shape[1] // hw[0]
        m = sift_cell_mask(image0, hw, img_stride, valid_mask=image0_mask)
    else:
        raise NotImplementedError(f"post-process '{method}' not supported")
    return m & (conf > test_thr)
