"""Batched on-device relative-pose estimation (essential-matrix RANSAC).

The reference estimates two-view pose with per-pair host OpenCV RANSAC
(reference src/utils/metrics.py:85-110, cv2.findEssentialMat + recoverPose)
— the wall-clock hot spot of its evaluation loop (SURVEY.md §3.2). This
module is the TPU-native alternative: a fully batched, static-shape
hypothesize-and-verify pipeline that poses EVERY pair of a batch in one
jitted call.

Design (all shapes static, jit/vmap-friendly):
  * fixed match capacity M with a validity mask (matches the framework's
    fixed-capacity match buffers);
  * S hypotheses drawn at once with the Gumbel-top-k trick (a random
    8-subset per hypothesis, no replacement, no while-loops);
  * 8-point nullspace per hypothesis via batched SVD, projected to the
    essential manifold;
  * Sampson-distance scoring in normalized camera coordinates with the same
    pixel-threshold normalization as the reference
    (metrics.py:56 ransac_thr = pixel_thr / mean focal);
  * best model refined by mask-weighted least squares over its inliers
    (two IRLS rounds), then cheirality-resolved into (R, t) by counting
    positive triangulated depths over the four E decompositions.

The cv2 path (utils/metrics.estimate_pose) stays the default for
benchmark-protocol parity; this solver is opt-in (evaluate --pose-solver
device) and is the building block for pod-scale SfM throughput.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PoseResult(NamedTuple):
    R: jnp.ndarray        # [B, 3, 3] rotation 0->1
    t: jnp.ndarray        # [B, 3] unit translation 0->1
    inliers: jnp.ndarray  # [B, M] bool
    n_inliers: jnp.ndarray  # [B] int32
    ok: jnp.ndarray       # [B] bool (enough inliers to trust the pose)


def _normalize(kpts, K):
    """Pixel -> normalized camera coordinates: K^-1 [u, v, 1]."""
    ones = jnp.ones_like(kpts[..., :1])
    pts_h = jnp.concatenate([kpts, ones], axis=-1)            # [M, 3]
    return pts_h @ jnp.linalg.inv(K).T                        # [M, 3] (z=1)


def _hartley(x, w, wsum):
    """Weighted isotropic normalization (center, RMS sqrt(2)) — conditions
    the 8-point system well enough for f32 SVD (without it the nullspace
    loses ~2 decimal digits and the pose drifts >1 deg)."""
    mu = (x[:, :2] * w[:, None]).sum(0) / wsum
    xc = x[:, :2] - mu
    rms = jnp.sqrt(jnp.maximum(
        (jnp.sum(xc * xc, -1) * w).sum() / wsum, 1e-12))
    s = jnp.sqrt(2.0) / rms
    xn = jnp.concatenate([xc * s, jnp.ones_like(x[:, :1])], -1)
    T = jnp.stack([
        jnp.stack([s, jnp.zeros(()), -s * mu[0]]),
        jnp.stack([jnp.zeros(()), s, -s * mu[1]]),
        jnp.asarray([0.0, 0.0, 1.0])])
    return xn, T


def _eight_point(x0, x1, w):
    """Weighted, Hartley-normalized 8-point nullspace for E (x1^T E x0 = 0).

    x0/x1: [N, 3] normalized homogeneous points; w: [N] row weights.
    Returns E [3, 3] projected onto the essential manifold."""
    wsum = jnp.maximum(w.sum(), 1e-6)
    x0n, T0 = _hartley(x0, w, wsum)
    x1n, T1 = _hartley(x1, w, wsum)
    A = (x1n[:, :, None] * x0n[:, None, :]).reshape(x0.shape[0], 9)
    A = A * w[:, None]
    # nullspace = right-singular vector of the smallest singular value
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = T1.T @ vt[-1].reshape(3, 3) @ T0
    # essential manifold: two equal singular values, third zero
    u, _, vt2 = jnp.linalg.svd(F)
    return (u * jnp.asarray([1.0, 1.0, 0.0])) @ vt2


def _sampson_parts(E, x0, x1):
    """Squared Sampson distance + its denominator (normalized coords). [M]"""
    Ex0 = x0 @ E.T                                            # [M, 3]
    Etx1 = x1 @ E                                             # [M, 3]
    num = jnp.sum(x1 * Ex0, axis=-1) ** 2
    den = jnp.maximum(Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2
                      + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2, 1e-12)
    return num / den, den


def _sampson(E, x0, x1):
    return _sampson_parts(E, x0, x1)[0]


def _triangulate_depths(R, t, x0, x1):
    """Linear two-view depth recovery: z0 * x1 x (R x0) = -x1 x t.

    Returns (z0, z1): depths of the midpoint-free linear solution. [M]"""
    Rx0 = x0 @ R.T                                            # [M, 3]
    c = jnp.cross(x1, Rx0)                                    # [M, 3]
    d = jnp.cross(x1, jnp.broadcast_to(t, x1.shape))          # [M, 3]
    z0 = -jnp.sum(c * d, axis=-1) / jnp.maximum(
        jnp.sum(c * c, axis=-1), 1e-12)
    z1 = (z0[:, None] * Rx0 + t)[..., 2]
    return z0, z1


def _decompose(E):
    """The four (R, t) decompositions of an essential matrix. [4,3,3],[4,3]"""
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))[..., None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _skew(v):
    return jnp.asarray([[0.0, -v[2], v[1]],
                        [v[2], 0.0, -v[0]],
                        [-v[1], v[0], 0.0]])


def _exp_so3(w):
    """Rodrigues exponential, Taylor-safe at 0."""
    theta = jnp.linalg.norm(w)
    K = _skew(w / jnp.maximum(theta, 1e-12))
    R = (jnp.eye(3) + jnp.sin(theta) * K
         + (1.0 - jnp.cos(theta)) * (K @ K))
    return jnp.where(theta < 1e-8, jnp.eye(3) + _skew(w), R)


def _tangent_basis(t):
    """[3, 2] orthonormal basis of the plane orthogonal to unit t."""
    # pick the coordinate axis least aligned with t for stability
    a = jnp.eye(3)[jnp.argmin(jnp.abs(t))]
    b1 = jnp.cross(t, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=1)


def _polish_pose(R, t, x0, x1, inl_w, iters: int = 5):
    """Damped Gauss-Newton on the 5-dof pose (so3 x unit-sphere tangent)
    minimizing the signed Sampson residual over weighted rows."""

    def residuals(params, R, t, B):
        Rp = _exp_so3(params[:3]) @ R
        tp = t + B @ params[3:]
        tp = tp / jnp.maximum(jnp.linalg.norm(tp), 1e-12)
        E = _skew(tp) @ Rp
        Ex0 = x0 @ E.T
        Etx1 = x1 @ E
        num = jnp.sum(x1 * Ex0, axis=-1)
        den = jnp.maximum(Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2
                          + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2, 1e-12)
        return (num / jnp.sqrt(den)) * inl_w

    def step(carry, _):
        R, t = carry
        B = _tangent_basis(t)
        z = jnp.zeros(5)
        r0 = residuals(z, R, t, B)
        J = jax.jacfwd(residuals)(z, R, t, B)       # [M, 5]
        H = J.T @ J
        H = H + 1e-8 * jnp.trace(H) * jnp.eye(5) + 1e-20 * jnp.eye(5)
        delta = -jnp.linalg.solve(H, J.T @ r0)
        Rn = _exp_so3(delta[:3]) @ R
        tn = t + B @ delta[3:]
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        # reject a diverging step (rare: degenerate inlier sets)
        better = (jnp.sum(residuals(jnp.zeros(5), Rn, tn, _tangent_basis(tn))
                          ** 2) <= jnp.sum(r0 ** 2))
        Rn = jnp.where(better, Rn, R)
        tn = jnp.where(better, tn, t)
        return (Rn, tn), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


def _pose_one(kpts0, kpts1, valid, K0, K1, thr_px, n_hyp, min_inliers, key):
    """Single-pair pose; vmapped over the batch by estimate_pose_batch."""
    M = kpts0.shape[0]
    x0 = _normalize(kpts0, K0)
    x1 = _normalize(kpts1, K1)
    f_mean = (K0[0, 0] + K0[1, 1] + K1[0, 0] + K1[1, 1]) / 4.0
    thr2 = (thr_px / f_mean) ** 2                 # reference metrics.py:56
    vmask = valid.astype(jnp.float32)

    # --- hypothesize: S random 8-subsets via Gumbel top-k over valid rows
    noise = jax.random.uniform(key, (n_hyp, M), minval=1e-6, maxval=1.0)
    scores = jnp.log(noise) + jnp.where(valid[None, :], 0.0, -1e9)
    _, subset_idx = jax.lax.top_k(scores, 8)                  # [S, 8]
    sx0 = x0[subset_idx]                                      # [S, 8, 3]
    sx1 = x1[subset_idx]
    Es = jax.vmap(lambda a, b: _eight_point(a, b, jnp.ones(8)))(sx0, sx1)

    # --- verify: Sampson inliers per hypothesis
    d2 = jax.vmap(_sampson, in_axes=(0, None, None))(Es, x0, x1)  # [S, M]
    inl = (d2 < thr2) & valid[None, :]
    counts = inl.sum(axis=1)
    best = jnp.argmax(counts)
    E = Es[best]

    # --- refine: two rounds of inlier-weighted least squares on all rows
    def refine(E, _):
        w = ((_sampson(E, x0, x1) < thr2) & valid).astype(jnp.float32)
        # keep the previous model when refinement would be under-determined
        E2 = _eight_point(x0, x1, w)
        return jnp.where(w.sum() >= 8, E2, E), None
    E, _ = jax.lax.scan(refine, E, None, length=2)

    inliers = (_sampson(E, x0, x1) < thr2) & valid
    n_inl = inliers.sum()

    # --- cheirality: pick the (R, t) with most positive depths
    Rs, ts = _decompose(E)
    def depth_count(R, t):
        z0, z1 = _triangulate_depths(R, t, x0, x1)
        return ((z0 > 0) & (z1 > 0) & inliers).sum()
    pos = jax.vmap(depth_count)(Rs, ts)
    pick = jnp.argmax(pos)
    R, t = Rs[pick], ts[pick]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    # --- polish: damped Gauss-Newton on (R, t) minimizing the Sampson
    # residual over the inlier set. The algebraic nullspace is limited by
    # f32 SVD precision (~2-3 deg of translation direction at sub-pixel
    # noise); GN converges to the cost's stationary point regardless.
    R, t = _polish_pose(R, t, x0, x1,
                        inliers.astype(jnp.float32), iters=5)
    E = _skew(t) @ R
    inliers = (_sampson(E, x0, x1) < thr2) & valid
    n_inl = inliers.sum()

    ok = n_inl >= min_inliers
    return PoseResult(R, t, inliers, n_inl.astype(jnp.int32), ok)


def estimate_pose_batch(kpts0, kpts1, valid, K0, K1, thr_px: float = 0.5,
                        n_hyp: int = 512, min_inliers: int = 12,
                        key=None) -> PoseResult:
    """Batched essential-matrix RANSAC + pose recovery on device.

    kpts0/kpts1: [B, M, 2] pixel matches (fixed capacity);
    valid: [B, M] bool; K0/K1: [B, 3, 3].
    thr_px matches the reference's RANSAC pixel threshold
    (configs/default.py:237 TRAINER.RANSAC_PIXEL_THR = 0.5).

    jit-able; wrap in jax.jit at the call site to amortize across batches.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    B = kpts0.shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(
        lambda a, b, v, ka, kb, kk: _pose_one(a, b, v, ka, kb, thr_px,
                                              n_hyp, min_inliers, kk)
    )(kpts0, kpts1, valid, K0, K1, keys)
