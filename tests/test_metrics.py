"""Metrics tests on synthetic two-view geometry."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from casmtr_tpu.utils import metrics as M


def synthetic_pair(rng, n=200, noise=0.0):
    """3D points seen by two cameras with a known relative pose."""
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    pts3d = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(4, 8, n)], -1)
    angle = 0.15
    R = np.array([[np.cos(angle), 0, np.sin(angle)], [0, 1, 0],
                  [-np.sin(angle), 0, np.cos(angle)]])
    t = np.array([0.5, 0.05, 0.02])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t

    def project(P, Rm, tv):
        pc = (Rm @ P.T).T + tv
        uv = (K @ pc.T).T
        return uv[:, :2] / uv[:, 2:3]

    pts0 = project(pts3d, np.eye(3), np.zeros(3))
    pts1 = project(pts3d, R, t)
    if noise:
        pts0 = pts0 + rng.normal(0, noise, pts0.shape)
        pts1 = pts1 + rng.normal(0, noise, pts1.shape)
    return pts0, pts1, T, K


def test_epipolar_errors_zero_for_perfect_matches(rng):
    pts0, pts1, T, K = synthetic_pair(rng)
    errs = M.compute_epipolar_errors(pts0, pts1, T, K, K)
    assert errs.max() < 1e-8


def test_epipolar_errors_nonzero_for_wrong_matches(rng):
    pts0, pts1, T, K = synthetic_pair(rng)
    errs = M.compute_epipolar_errors(pts0, np.roll(pts1, 1, 0), T, K, K)
    assert np.median(errs) > 1e-5


def test_pose_estimation_recovers_pose(rng):
    pts0, pts1, T, K = synthetic_pair(rng, noise=0.2)
    R_err, t_err, inliers = M.compute_pose_errors(pts0, pts1, T, K, K)
    assert R_err < 1.0
    assert t_err < 2.0
    assert inliers.mean() > 0.8


def test_error_auc_known_values():
    # all errors at 0 -> perfect AUC
    aucs = M.error_auc([0.0] * 10)
    assert aucs["auc@5"] == pytest.approx(1.0, abs=0.1)
    # all errors way beyond the thresholds -> ~0
    aucs = M.error_auc([100.0] * 10)
    assert aucs["auc@20"] < 0.15


def test_aggregate_metrics_dedup(rng):
    m = {
        "identifiers": ["a", "b", "a"],
        "R_errs": [1.0, 2.0, 50.0],
        "t_errs": [1.0, 3.0, 50.0],
        "epi_errs": [np.array([1e-5]), np.array([1e-3]), np.array([1.0])],
    }
    out = M.aggregate_metrics(m, epi_err_thr=1e-4)
    # duplicate 'a' keeps the LAST occurrence (reference metrics.py:248 dict
    # overwrite semantics) -> pose errors are [50, max(2,3)]
    assert out["auc@5"] == pytest.approx(
        M.error_auc([50.0, 3.0])["auc@5"])
    assert out["prec@1e-04"] == pytest.approx(0.0)  # pairs 'a'(last) and 'b'
