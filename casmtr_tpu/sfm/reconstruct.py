"""Incremental two-view-chain reconstruction + metrics (ATE).

Builds a small SfM pipeline on top of the matcher: relative poses from
matches (host RANSAC — per-pair CPU work, like the reference eval),
chained initialization, DLT triangulation, then Schur-complement BA
(casmtr_tpu.sfm.ba). This is the north-star capability (BASELINE.md):
keyframe-partitioned matching + distributed BA.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from casmtr_tpu.sfm import ba as ba_mod
from casmtr_tpu.sfm.geometry import (rodrigues, rotation_to_rvec, triangulate)


def chain_poses(pairwise: List[Tuple[np.ndarray, np.ndarray]]):
    """Compose a camera chain from relative poses [(R_i->i+1, t_i->i+1)].
    Returns per-camera world->cam (R, t) with camera 0 at identity; relative
    translations have unit scale (monocular ambiguity)."""
    Rs = [np.eye(3)]
    ts = [np.zeros(3)]
    for R_rel, t_rel in pairwise:
        Rs.append(R_rel @ Rs[-1])
        ts.append(R_rel @ ts[-1] + t_rel)
    return np.stack(Rs), np.stack(ts)


def build_problem(Rs, ts, K, tracks: Dict[int, List[Tuple[int, np.ndarray]]],
                  max_obs: Optional[int] = None) -> ba_mod.BAProblem:
    """Assemble a BAProblem from camera chain + point tracks.

    tracks: point_id -> [(cam_id, uv), ...] (>= 2 views each). Points are
    initialized by DLT triangulation from their first two views.
    Observations whose init point lands behind (or implausibly close to)
    its camera are marked invalid up front — a single wrong-cheirality
    point otherwise dominates the LM accept/reject with ~1e9 px residuals."""
    pts = []
    obs_cam, obs_pt, obs_uv, obs_ok = [], [], [], []
    for pid, (tid, views) in enumerate(sorted(tracks.items())):
        (c0, uv0), (c1, uv1) = views[0], views[1]
        P0 = K @ np.concatenate([Rs[c0], ts[c0][:, None]], axis=1)
        P1 = K @ np.concatenate([Rs[c1], ts[c1][:, None]], axis=1)
        X = np.asarray(triangulate(jnp.asarray(P0), jnp.asarray(P1),
                                   jnp.asarray(uv0[None]),
                                   jnp.asarray(uv1[None])))[0]
        pts.append(X)
        for c, uv in views:
            z = float(Rs[c][2] @ X + ts[c][2])
            obs_cam.append(c)
            obs_pt.append(pid)
            obs_uv.append(uv)
            obs_ok.append(bool(np.all(np.isfinite(X))) and z > 1e-6)
    n = len(obs_cam)
    cap = max_obs or n
    if n > cap:
        raise ValueError(
            f"{n} observations exceed max_obs={cap}; raise max_obs (the "
            f"static capacity the BA loop jits against)")
    pad = cap - n
    valid = np.asarray(obs_ok + [False] * pad)
    obs_cam = np.asarray(obs_cam + [0] * pad, np.int32)
    obs_pt = np.asarray(obs_pt + [0] * pad, np.int32)
    obs_uv = np.asarray(obs_uv + [[0.0, 0.0]] * pad, np.float32)
    rvecs = np.stack([np.asarray(rotation_to_rvec(jnp.asarray(R)))
                      for R in Rs])
    return ba_mod.BAProblem(
        cam_rvec=jnp.asarray(rvecs.astype(np.float32)),
        cam_tvec=jnp.asarray(np.asarray(ts, np.float32)),
        points=jnp.asarray(np.stack(pts).astype(np.float32)),
        K=jnp.asarray(K.astype(np.float32)),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv), obs_valid=jnp.asarray(valid))


def camera_centers(p: ba_mod.BAProblem) -> np.ndarray:
    """World positions of the cameras: -R^T t."""
    R = np.asarray(rodrigues(p.cam_rvec))
    t = np.asarray(p.cam_tvec)
    return -np.einsum("cij,cj->ci", R.transpose(0, 2, 1), t)


def ate_rmse(centers_est: np.ndarray, centers_gt: np.ndarray) -> float:
    """Absolute trajectory error after similarity (Umeyama) alignment."""
    mu_e = centers_est.mean(0)
    mu_g = centers_gt.mean(0)
    e = centers_est - mu_e
    g = centers_gt - mu_g
    U, S, Vt = np.linalg.svd(e.T @ g / len(e))
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1, 1, d])
    R = U @ D @ Vt
    var_e = (e ** 2).sum() / len(e)
    scale = (S * np.diag(D)).sum() / max(var_e, 1e-12)
    aligned = scale * e @ R + mu_g
    return float(np.sqrt(((aligned - centers_gt) ** 2).sum(-1).mean()))
