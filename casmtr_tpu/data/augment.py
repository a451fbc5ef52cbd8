"""Photometric / geometric augmentations, torch- and albumentations-free.

reference: src/utils/augment.py:1-55 (DarkAug / MobileAug presets — note the
reference DISABLES them: build_augmentor raises if a method is set,
augment.py:42-43) and src/datasets/megadepth.py:107-114 (random-rotation
augmentation with intrinsics update). Implemented here in numpy/cv2.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class DarkAug:
    """Low-light simulation: random gamma + brightness/contrast jitter
    (the spirit of the reference's albumentations preset: RandomBrightnessContrast
    + RandomGamma + blur; augment.py:10-22)."""

    def __init__(self, rng: Optional[np.random.Generator] = None):
        self.rng = rng or np.random.default_rng()

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """img: [h, w, c] float32 in [0, 1]."""
        gamma = self.rng.uniform(1.2, 2.2)
        img = np.power(np.clip(img, 0, 1), gamma)
        brightness = self.rng.uniform(-0.25, 0.0)
        contrast = self.rng.uniform(0.7, 1.0)
        img = np.clip((img - 0.5) * contrast + 0.5 + brightness, 0, 1)
        if self.rng.random() < 0.3:
            k = int(self.rng.integers(3, 8)) | 1
            img = cv2.GaussianBlur(img, (k, k), 0)
        return img.astype(np.float32)


class MobileAug:
    """Mobile-capture simulation: motion blur + color jitter + noise
    (reference augment.py:25-39 preset)."""

    def __init__(self, rng: Optional[np.random.Generator] = None):
        self.rng = rng or np.random.default_rng()

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if self.rng.random() < 0.5:
            k = int(self.rng.integers(3, 10))
            kern = np.zeros((k, k), np.float32)
            angle = self.rng.uniform(0, 180)
            c = (k - 1) / 2
            dx, dy = np.cos(np.radians(angle)), np.sin(np.radians(angle))
            for t in np.linspace(-c, c, k * 2):
                y, x = int(round(c + t * dy)), int(round(c + t * dx))
                if 0 <= y < k and 0 <= x < k:
                    kern[y, x] = 1
            kern /= max(kern.sum(), 1)
            img = cv2.filter2D(img, -1, kern)
        if self.rng.random() < 0.5:
            img = img + self.rng.normal(0, 0.02, img.shape)
        shift = self.rng.uniform(-0.05, 0.05, (1, 1, img.shape[-1]))
        return np.clip(img + shift, 0, 1).astype(np.float32)


def build_augmentor(method: Optional[str], **kwargs):
    """reference augment.py:42-55 dispatch (the reference raises for any
    non-None method because augmentation is disabled in released training;
    here the presets are functional)."""
    if method is None:
        return None
    if method == "dark":
        return DarkAug(**kwargs)
    if method == "mobile":
        return MobileAug(**kwargs)
    raise ValueError(f"Invalid augmentation method: {method}")


def random_rotation(img: np.ndarray, depth: np.ndarray, mask: np.ndarray,
                    K: np.ndarray, max_deg: float = 90.0,
                    rng: Optional[np.random.Generator] = None):
    """Random in-plane rotation of image0 with consistent depth/mask warping
    and intrinsics update K <- H @ K (reference megadepth.py:107-114 uses
    kornia RandomAffine; same semantics with cv2).

    Returns (img, depth, mask, K_new)."""
    rng = rng or np.random.default_rng()
    h, w = img.shape[:2]
    deg = float(rng.uniform(-max_deg, max_deg))
    M = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), deg, 1.0)
    H = np.eye(3, dtype=np.float64)
    H[:2] = M
    img_r = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR)
    depth_r = cv2.warpAffine(depth, M, (w, h), flags=cv2.INTER_NEAREST)
    mask_r = cv2.warpAffine(mask.astype(np.uint8), M, (w, h),
                            flags=cv2.INTER_NEAREST).astype(bool)
    K_new = (H @ K).astype(np.float32)
    return img_r, depth_r, mask_r, K_new
