"""Augmentation tests: photometric presets preserve range/shape, and
random_rotation's intrinsics update is geometrically consistent (a feature at
pixel p moves to H @ p where H = K_new @ K^-1)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from casmtr_tpu.data.augment import (DarkAug, MobileAug, build_augmentor,
                                     random_rotation)


def test_photometric_presets_range_and_determinism():
    rng = np.random.default_rng(0)
    img = rng.random((48, 64, 3)).astype(np.float32)
    for aug_cls in (DarkAug, MobileAug):
        out = aug_cls(rng=np.random.default_rng(7))(img.copy())
        assert out.shape == img.shape and out.dtype == np.float32
        assert out.min() >= 0.0 and out.max() <= 1.0
        out2 = aug_cls(rng=np.random.default_rng(7))(img.copy())
        np.testing.assert_allclose(out, out2)
    # dark aug darkens on average (gamma >= 1.2, brightness <= 0)
    dark = DarkAug(rng=np.random.default_rng(1))(img.copy())
    assert dark.mean() < img.mean()


def test_build_augmentor_dispatch():
    assert build_augmentor(None) is None
    assert isinstance(build_augmentor("dark"), DarkAug)
    assert isinstance(build_augmentor("mobile"), MobileAug)
    with pytest.raises(ValueError):
        build_augmentor("nope")


def test_random_rotation_geometry():
    h, w = 60, 80
    img = np.zeros((h, w, 3), np.float32)
    p = np.array([55.0, 20.0])  # (x, y): a bright dot
    img[int(p[1]), int(p[0])] = 1.0
    depth = np.full((h, w), 2.0, np.float32)
    mask = np.ones((h, w), bool)
    K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]], np.float32)

    rng = np.random.default_rng(3)
    img_r, depth_r, mask_r, K_new = random_rotation(img, depth, mask, K,
                                                    max_deg=45.0, rng=rng)
    assert mask_r.dtype == bool and depth_r.shape == (h, w)
    # recover the pixel homography from the intrinsics update
    H = K_new @ np.linalg.inv(K)
    p_new = (H @ np.array([p[0], p[1], 1.0]))[:2]
    # the dot's energy moved to where H maps it (allow interp spread)
    ys, xs, _ = np.nonzero(img_r > 0.2)
    assert len(xs) > 0
    centroid = np.array([xs.mean(), ys.mean()])
    np.testing.assert_allclose(centroid, p_new, atol=1.0)
    # depth is warped with the image: the valid region keeps its value
    assert abs(depth_r[int(round(p_new[1])), int(round(p_new[0]))] - 2.0) < 1e-6
