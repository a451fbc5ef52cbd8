"""Scale-space blob detector + 'sift' post-process filtering
(ops/sift.py; reference post_processing.py:46-75 semantics — keep matches
whose coarse cell contains a detected keypoint)."""

import numpy as np
import pytest

import jax.numpy as jnp

from casmtr_tpu.ops.sift import scale_space_keypoints, sift_cell_mask
from casmtr_tpu.ops.nms import post_process_mask


def _blob_image(h, w, centers, sigma=4.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    for (cy, cx) in centers:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma ** 2))
    return img.astype(np.float32)


def test_detector_finds_blob_centers():
    centers = [(32, 40), (80, 96), (60, 20)]
    img = _blob_image(128, 128, centers)
    xy, valid = scale_space_keypoints(jnp.asarray(img)[None], max_kpts=64)
    xy = np.asarray(xy[0])[np.asarray(valid[0])]
    assert len(xy) >= len(centers)
    for (cy, cx) in centers:
        d = np.hypot(xy[:, 0] - cx, xy[:, 1] - cy).min()
        assert d <= 3.0, (cy, cx, d)


def test_detector_respects_valid_mask():
    img = _blob_image(128, 128, [(32, 40), (96, 100)])
    vm = np.zeros((128, 128), bool)
    vm[:64] = True  # only the top half is valid
    xy, valid = scale_space_keypoints(jnp.asarray(img)[None], max_kpts=64,
                                      valid_mask=jnp.asarray(vm)[None])
    xy = np.asarray(xy[0])[np.asarray(valid[0])]
    assert len(xy) >= 1
    assert (xy[:, 1] < 64 + 2).all()  # no keypoints in the masked half


def test_sift_cell_mask_marks_blob_cells():
    centers = [(32, 40), (80, 96)]
    img = _blob_image(128, 128, centers)
    rgb = jnp.asarray(np.repeat(img[..., None], 3, axis=2))[None]
    hw_c = (16, 16)  # stride 8
    mask = np.asarray(sift_cell_mask(rgb, hw_c, 8))
    assert mask.shape == (1, 256)
    for (cy, cx) in centers:
        cell = round(cy / 8) * 16 + round(cx / 8)
        assert mask[0, cell], (cy, cx)
    # sparse: far fewer cells than the grid
    assert mask.sum() < 64


def test_post_process_dispatch_sift():
    img = _blob_image(128, 128, [(32, 40)])
    rgb = jnp.asarray(np.repeat(img[..., None], 3, axis=2))[None]
    conf = jnp.full((1, 256), 0.9)
    m = post_process_mask("sift", conf, (16, 16), 0.5, image0=rgb)
    assert bool(m[0, 4 * 16 + 5])          # the blob's cell survives
    assert int(m.sum()) < 64               # most cells filtered
    with pytest.raises(ValueError):
        post_process_mask("sift", conf, (16, 16), 0.5)


def test_detector_rejects_too_small_image():
    img = jnp.zeros((1, 24, 24))
    with pytest.raises(ValueError, match="too small"):
        scale_space_keypoints(img)
