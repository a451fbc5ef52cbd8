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

import jax
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
    point otherwise dominates the LM accept/reject with ~1e9 px residuals.

    Vectorized for reconstruction scale: the per-track DLT triangulations
    run as ONE batched (vmap) SVD call and the cheirality test as one
    einsum — at 50k tracks the per-track eager-dispatch version spent
    ~30 s in host round trips."""
    items = sorted(tracks.items())
    Rs_np = np.asarray(Rs, np.float64)
    ts_np = np.asarray(ts, np.float64)
    counts = np.asarray([len(views) for _, views in items], np.int64)
    obs_cam_l = np.fromiter((c for _, views in items for c, _ in views),
                            np.int32, count=int(counts.sum()))
    obs_uv_l = np.asarray([uv for _, views in items for _, uv in views],
                          np.float64).reshape(-1, 2)
    obs_pt_l = np.repeat(np.arange(len(items), dtype=np.int32), counts)
    # batched DLT from each track's first two views
    c0 = np.asarray([views[0][0] for _, views in items], np.int32)
    c1 = np.asarray([views[1][0] for _, views in items], np.int32)
    uv0 = np.asarray([views[0][1] for _, views in items], np.float64)
    uv1 = np.asarray([views[1][1] for _, views in items], np.float64)
    Pm = np.einsum("ij,cjk->cik", K,
                   np.concatenate([Rs_np, ts_np[..., None]], axis=2))
    X = np.asarray(jax.vmap(
        lambda p0, p1, a, b: triangulate(p0, p1, a[None], b[None])[0])(
        jnp.asarray(Pm)[c0], jnp.asarray(Pm)[c1],
        jnp.asarray(uv0), jnp.asarray(uv1)))
    # per-observation cheirality against the init point
    z = (np.einsum("nj,nj->n", Rs_np[obs_cam_l][:, 2, :],
                   X[obs_pt_l].astype(np.float64))
         + ts_np[obs_cam_l][:, 2])
    ok = np.all(np.isfinite(X), axis=1)[obs_pt_l] & (z > 1e-6)
    n = len(obs_cam_l)
    cap = max_obs or n
    if n > cap:
        raise ValueError(
            f"{n} observations exceed max_obs={cap}; raise max_obs (the "
            f"static capacity the BA loop jits against)")
    pad = cap - n
    valid = np.concatenate([ok, np.zeros(pad, bool)])
    obs_cam = np.concatenate([obs_cam_l, np.zeros(pad, np.int32)])
    obs_pt = np.concatenate([obs_pt_l, np.zeros(pad, np.int32)])
    obs_uv = np.concatenate(
        [obs_uv_l.astype(np.float32), np.zeros((pad, 2), np.float32)])
    rvecs = np.asarray(jax.vmap(rotation_to_rvec)(jnp.asarray(Rs_np)))
    return ba_mod.BAProblem(
        cam_rvec=jnp.asarray(rvecs.astype(np.float32)),
        cam_tvec=jnp.asarray(np.asarray(ts, np.float32)),
        points=jnp.asarray(X.astype(np.float32)),
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
