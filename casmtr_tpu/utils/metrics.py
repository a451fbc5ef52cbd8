"""Evaluation metrics: symmetric epipolar distance, relative pose estimation
(host-side OpenCV RANSAC — per-pair CPU work in the reference too), and pose
AUC aggregation (reference: src/utils/metrics.py:13-261), torch-free.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def cross_product_matrix(t: np.ndarray) -> np.ndarray:
    """[3] -> skew-symmetric [3, 3]."""
    return np.array([[0, -t[2], t[1]],
                     [t[2], 0, -t[0]],
                     [-t[1], t[0], 0]], dtype=t.dtype)


def symmetric_epipolar_distance(pts0, pts1, E, K0, K1) -> np.ndarray:
    """Squared symmetric epipolar distance in normalized coords
    (reference metrics.py:44-61). pts: [N, 2] pixels."""
    pts0 = (pts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    pts1 = (pts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    p0 = np.concatenate([pts0, np.ones_like(pts0[:, :1])], -1)
    p1 = np.concatenate([pts1, np.ones_like(pts1[:, :1])], -1)
    Ep0 = p0 @ E.T
    p1Ep0 = np.sum(p1 * Ep0, -1)
    Etp1 = p1 @ E
    d = p1Ep0 ** 2 * (1.0 / (Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2 + 1e-12)
                      + 1.0 / (Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2 + 1e-12))
    return d


def compute_epipolar_errors(mkpts0, mkpts1, T_0to1, K0, K1) -> np.ndarray:
    """Per-match epipolar error for one pair (reference metrics.py:64-82)."""
    Tx = cross_product_matrix(T_0to1[:3, 3])
    E = Tx @ T_0to1[:3, :3]
    return symmetric_epipolar_distance(mkpts0, mkpts1, E, K0, K1)


def estimate_pose(kpts0, kpts1, K0, K1, thresh: float, conf: float = 0.99999,
                  max_iters: int = 10000):
    """Essential-matrix RANSAC + recoverPose (reference metrics.py:85-110).
    Returns (R, t, inlier_mask) or None."""
    if len(kpts0) < 5:
        return None
    kpts0 = (kpts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    kpts1 = (kpts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    ransac_thr = thresh / np.mean([K0[0, 0], K1[1, 1], K0[0, 0], K1[1, 1]])
    E, mask = cv2.findEssentialMat(kpts0, kpts1, np.eye(3),
                                   threshold=ransac_thr, prob=conf,
                                   method=cv2.RANSAC)
    if E is None:
        return None
    best_n, ret = 0, None
    for _E in np.split(E, len(E) // 3):
        n, R, t, _ = cv2.recoverPose(_E, kpts0, kpts1, np.eye(3), 1e9,
                                     mask=mask)
        if n > best_n:
            ret = (R, t[:, 0], mask.ravel() > 0)
            best_n = n
    return ret


def relative_pose_error(T_0to1, R, t, ignore_gt_t_thr: float = 0.0):
    """Angular errors of t (with E-sign ambiguity) and R
    (reference metrics.py:13-28). Returns (t_err_deg, R_err_deg)."""
    t_gt = T_0to1[:3, 3]
    n = np.linalg.norm(t) * np.linalg.norm(t_gt)
    t_err = np.rad2deg(np.arccos(np.clip(np.dot(t, t_gt) / (n + 1e-12),
                                         -1.0, 1.0)))
    t_err = np.minimum(t_err, 180 - t_err)
    if np.linalg.norm(t_gt) < ignore_gt_t_thr:
        t_err = 0.0
    R_gt = T_0to1[:3, :3]
    cos = np.clip((np.trace(R.T @ R_gt) - 1) / 2, -1.0, 1.0)
    R_err = np.rad2deg(np.abs(np.arccos(cos)))
    return t_err, R_err


def compute_pose_errors(mkpts0, mkpts1, T_0to1, K0, K1,
                        pixel_thr: float = 0.5, conf: float = 0.99999):
    """Pose errors for one pair (reference metrics.py:113-146).
    Returns (R_err, t_err, inliers)."""
    ret = estimate_pose(mkpts0, mkpts1, K0, K1, pixel_thr, conf)
    if ret is None:
        return np.inf, np.inf, np.zeros((0,), bool)
    R, t, inliers = ret
    t_err, R_err = relative_pose_error(T_0to1, R, t)
    return R_err, t_err, inliers


def error_auc(errors: Sequence[float], thresholds=(5, 10, 20)) -> Dict:
    """AUC of the recall-vs-error curve (reference metrics.py:207-224)."""
    errors = [0] + sorted(float(e) for e in errors)
    recall = list(np.linspace(0, 1, len(errors)))
    aucs = {}
    for thr in thresholds:
        last = np.searchsorted(errors, thr)
        y = recall[:last] + [recall[last - 1]]
        x = errors[:last] + [thr]
        aucs[f"auc@{thr}"] = np.trapezoid(y, x) / thr
    return aucs


def epidist_prec(errors: Sequence[np.ndarray], thresholds) -> Dict:
    """Mean per-pair matching precision (reference metrics.py:227-238)."""
    out = {}
    for thr in thresholds:
        prec = [np.mean(e < thr) if len(e) > 0 else 0 for e in errors]
        out[f"prec@{thr:.0e}"] = float(np.mean(prec)) if prec else 0.0
    return out


def gather_metrics(metrics: Dict) -> Dict:
    """Concatenate per-pair metric lists from every host (reference
    lightning_cascade.py:310-348 gather(..) before aggregation). Single
    process: identity. Dedup happens later in aggregate_metrics."""
    from casmtr_tpu.parallel import comm
    gathered = comm.all_gather(metrics)
    if len(gathered) == 1:
        return metrics
    return {k: [x for g in gathered for x in g[k]] for k in metrics}


def aggregate_metrics(metrics: Dict, epi_err_thr: float = 5e-4) -> Dict:
    """Dataset-level aggregation with duplicate-pair dedup
    (reference metrics.py:241-261). ``metrics`` holds lists: identifiers,
    R_errs, t_errs, epi_errs (list of per-pair arrays)."""
    # LAST occurrence wins (reference metrics.py:248 dict overwrite)
    unq = OrderedDict((iden, i)
                      for i, iden in enumerate(metrics["identifiers"]))
    ids = list(unq.values())
    pose_errors = np.max(np.stack([metrics["R_errs"], metrics["t_errs"]]),
                         axis=0)[ids]
    aucs = error_auc(pose_errors)
    precs = epidist_prec([metrics["epi_errs"][i] for i in ids],
                         [epi_err_thr])
    return {**aucs, **precs}
