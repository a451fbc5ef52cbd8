"""Host-side image/depth IO (numpy + cv2 + h5py), torch-free.

Re-designs reference src/utils/dataset.py:67-267: longer-edge resize,
divisible-by-df rounding, bottom-right square padding with masks, MegaDepth
h5 depth, ScanNet fixed 640x480 + pose/intrinsics readers. Outputs are NHWC
numpy arrays in [0, 1].
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def get_resized_wh(w: int, h: int, resize: Optional[int]):
    """Resize the LONGER edge to ``resize`` (reference dataset.py:67-73)."""
    if resize is None:
        return w, h
    scale = resize / max(h, w)
    return int(round(w * scale)), int(round(h * scale))


def get_divisible_wh(w: int, h: int, df: Optional[int]):
    """Round down to a multiple of df (reference dataset.py:76-81)."""
    if df is None:
        return w, h
    return int(w // df * df), int(h // df * df)


def pad_bottom_right(inp: np.ndarray, pad_size: int, ret_mask: bool = False):
    """Zero-pad to (pad_size, pad_size) bottom-right
    (reference dataset.py:84-106). inp: [h, w] or [h, w, c]."""
    assert pad_size >= max(inp.shape[:2]), (pad_size, inp.shape)
    shape = ((pad_size, pad_size) if inp.ndim == 2
             else (pad_size, pad_size, inp.shape[2]))
    padded = np.zeros(shape, dtype=inp.dtype)
    padded[:inp.shape[0], :inp.shape[1]] = inp
    mask = None
    if ret_mask:
        mask = np.zeros((pad_size, pad_size), dtype=bool)
        mask[:inp.shape[0], :inp.shape[1]] = True
    return padded, mask


def _imread(path: str, gray: bool) -> np.ndarray:
    img = cv2.imread(str(path),
                     cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    if not gray:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def read_megadepth_image(path: str, resize: Optional[int] = None,
                         df: Optional[int] = None, padding: bool = False,
                         gray: bool = False, pad_size: Optional[int] = None):
    """Returns (image [h, w, 3] float32 in [0,1], mask [h, w] bool|None,
    scale [2] float32 = [w/w_new, h/h_new]) — reference dataset.py:111-178.

    pad_size: pad to a FIXED square canvas instead of max(h_new, w_new)
    (TPU-specific: keeps eval shapes static so XLA compiles once; padded
    regions are masked)."""
    img = _imread(path, gray)
    h, w = img.shape[:2]
    w_new, h_new = get_divisible_wh(*get_resized_wh(w, h, resize), df)
    scale = np.array([w / w_new, h / h_new], np.float32)

    if padding:
        # native fused resize+pad+normalize fast path (C++,
        # casmtr_tpu/native/image_ops.cpp); numpy/cv2 fallback below
        try:
            from casmtr_tpu.native import HAVE_NATIVE, resize_pad_normalize
        except Exception:
            HAVE_NATIVE = False
        if HAVE_NATIVE:
            src = img if img.ndim == 3 else img[..., None]
            canvas, mask = resize_pad_normalize(
                np.ascontiguousarray(src), h_new, w_new,
                pad_size or max(h_new, w_new))
            return canvas, mask, scale

    img = cv2.resize(img, (w_new, h_new))
    mask = None
    if padding:
        img, mask = pad_bottom_right(
            img, pad_size or max(h_new, w_new), ret_mask=True)
    img = img.astype(np.float32) / 255.0
    if gray:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img, mask, scale


def read_megadepth_depth(path: str, pad_to: Optional[int] = None) -> np.ndarray:
    """MegaDepth h5 depth (reference dataset.py:197-205). [h, w] float32."""
    with h5py.File(path, "r") as f:
        depth = np.asarray(f["depth"])
    if pad_to is not None:
        depth, _ = pad_bottom_right(depth, pad_to, ret_mask=False)
    return depth.astype(np.float32)


def read_scannet_image(path: str, resize: Tuple[int, int] = (640, 480),
                       gray: bool = False) -> np.ndarray:
    """ScanNet image resized to (w, h)=(640, 480)
    (reference dataset.py:210-246). [h, w, 3] float32 in [0, 1]."""
    img = _imread(path, gray)
    img = cv2.resize(img, resize)
    img = img.astype(np.float32) / 255.0
    if gray:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img


def read_scannet_depth(path: str) -> np.ndarray:
    """PNG depth in millimetres -> metres (reference dataset.py:249-256)."""
    depth = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    return (depth / 1000.0).astype(np.float32)


def read_scannet_pose(path: str) -> np.ndarray:
    """Camera2World txt -> World2Camera (reference dataset.py:259-267)."""
    cam2world = np.loadtxt(path, delimiter=" ")
    return np.linalg.inv(cam2world)


def load_im_padding(path0: str, path1: str, resize: int = 1024, df: int = 32):
    """Single-pair demo loading: resize so the SHORTER side is ``resize``,
    divisible-by-df, pad both to a common canvas + masks
    (reference src/utils/misc.py:137-174). Returns (img0, img1, mask0, mask1,
    scale0, scale1) with images [1, H, W, 3]."""
    imgs, sizes, scales = [], [], []
    for p in (path0, path1):
        img = _imread(p, gray=False)
        h, w = img.shape[:2]
        s = resize / min(h, w)
        w_new, h_new = get_divisible_wh(int(round(w * s)), int(round(h * s)),
                                        df)
        img = cv2.resize(img, (w_new, h_new))
        imgs.append(img)
        sizes.append((h_new, w_new))
        scales.append(np.array([w / w_new, h / h_new], np.float32))
    H = max(s[0] for s in sizes)
    W = max(s[1] for s in sizes)
    outs, masks = [], []
    for img in imgs:
        canvas = np.zeros((H, W, 3), np.float32)
        canvas[:img.shape[0], :img.shape[1]] = img.astype(np.float32) / 255.0
        mask = np.zeros((H, W), bool)
        mask[:img.shape[0], :img.shape[1]] = True
        outs.append(canvas[None])
        masks.append(mask[None])
    return outs[0], outs[1], masks[0], masks[1], scales[0], scales[1]
