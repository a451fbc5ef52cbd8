"""Core SfM geometry in jnp: rotations, projection, triangulation.

North-star extension (SURVEY.md §2.9 / BASELINE.md): no reference code
exists for this — it is new TPU-native capability layered on the matcher.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [.., 3] -> rotation matrix [.., 3, 3].

    Written with the UNNORMALIZED skew matrix and sinc-style coefficients
    ``R = I + a(th) K + b(th) K^2`` (a = sin th / th, b = (1-cos th)/th^2)
    so the Jacobian is finite and exact at theta = 0 — dividing by a
    clamped ``norm(rvec)`` makes jacfwd produce NaN at exactly zero (the
    0/0 tangent of the norm), which poisons Gauss-Newton systems whose
    initial rotation is the identity (pose-graph averaging, BA camera 0)."""
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)     # [.., 1]
    small = theta2 < 1e-12
    t2s = jnp.where(small, 1.0, theta2)      # branch-safe select-on-input
    th = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(th)) / t2s)
    rx, ry, rz = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    zero = jnp.zeros_like(rx)
    K = jnp.stack([
        jnp.stack([zero, -rz, ry], -1),
        jnp.stack([rz, zero, -rx], -1),
        jnp.stack([-ry, rx, zero], -1),
    ], -2)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + a[..., None] * K + b[..., None] * (K @ K)


def project(rvec: jnp.ndarray, tvec: jnp.ndarray, X: jnp.ndarray,
            K: jnp.ndarray) -> jnp.ndarray:
    """Project world points into a camera. rvec/tvec: [3]; X: [.., 3];
    K: [3, 3]. Returns pixel coords [.., 2]."""
    R = rodrigues(rvec)
    Xc = X @ R.T + tvec
    uv = Xc @ K.T
    return uv[..., :2] / jnp.maximum(uv[..., 2:3], 1e-9)


def triangulate(P0: jnp.ndarray, P1: jnp.ndarray, uv0: jnp.ndarray,
                uv1: jnp.ndarray) -> jnp.ndarray:
    """Linear (DLT) two-view triangulation.

    P0/P1: [3, 4] projection matrices; uv0/uv1: [N, 2] pixels.
    Returns [N, 3] world points."""
    def one(u0, u1):
        A = jnp.stack([
            u0[0] * P0[2] - P0[0],
            u0[1] * P0[2] - P0[1],
            u1[0] * P1[2] - P1[0],
            u1[1] * P1[2] - P1[1],
        ])
        _, _, vt = jnp.linalg.svd(A)
        X = vt[-1]
        # sign-preserving clamp: degenerate pairs (near-zero baseline /
        # pure rotation) give X[3] ~ 0 — keep the point finite so downstream
        # costs stay finite (cheirality masking rejects it later)
        w = X[3]
        w = jnp.where(w >= 0, jnp.maximum(w, 1e-12), jnp.minimum(w, -1e-12))
        return X[:3] / w

    return jax.vmap(one)(uv0, uv1)


def rotation_to_rvec(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle [3] (principal branch), including the
    theta ~ pi branch where the skew-part axis vanishes."""
    cos = jnp.clip((jnp.trace(R) - 1) / 2, -1.0, 1.0)
    theta = jnp.arccos(cos)
    skew = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                      R[1, 0] - R[0, 1]])
    s = jnp.maximum(jnp.linalg.norm(skew), 1e-12)
    axis_generic = skew / s
    # theta ~ pi: R ~ 2 a a^T - I, so a^2 from the diagonal; signs from the
    # column of (R + I) with the largest diagonal (sign ambiguity at exactly
    # pi is inherent: +/-a encode the same rotation)
    B = R + jnp.eye(3)
    k = jnp.argmax(jnp.diag(B))
    col = B[:, k]
    axis_pi = col / jnp.maximum(jnp.linalg.norm(col), 1e-12)
    axis = jnp.where(theta > jnp.pi - 1e-3, axis_pi, axis_generic)
    return axis * theta
