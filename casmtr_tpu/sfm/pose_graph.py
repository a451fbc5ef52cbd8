"""Pose-graph optimization: rotation averaging + translation/scale averaging.

North-star extension (SURVEY.md §2.9 / BASELINE.md) — no reference code
exists for this. The incremental chain (pipeline.chain_with_scale) only uses
consecutive keyframe pairs, so drift accumulates linearly along the
sequence; the non-consecutive pairs the pipeline *already matches*
(pair_graph overlaps >= 2, loop pairs) carry redundant relative-pose
measurements that can cancel that drift before bundle adjustment. This
module consumes them as a pose graph.

Monocular relative translations have unknown per-edge scale, so the classic
two-stage global-SfM decomposition applies (and keeps every stage a small
dense solve — ideal for one jitted call on device):

  1. **Rotation averaging** — damped Gauss-Newton on the product manifold
     SO(3)^C: residual per edge ``log(R_j (R_ij R_i)^T)`` under left
     perturbations ``R_i <- exp(th_i) R_i``, Huber-IRLS weighted, gauge
     fixed by pinning camera 0.
  2. **Translation + scale averaging** — with rotations frozen the
     constraint ``t_j = R_ij t_i + s_e * t_ij`` is LINEAR in the camera
     translations and the per-edge scales s_e, so each Huber-IRLS round is
     one exact weighted least-squares solve. Gauge: camera 0's translation
     is pinned and the total scale is pinned to the initialization's
     (sum of the edge scales), preserving the chain's global scale.

Everything is static-shape and jit-compatible: the edge list is a fixed
array; problems of the same (C, E) reuse one compiled executable.
Conventions match sfm/ba.py: world->cam poses, x_cam = R x_world + t.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from casmtr_tpu.sfm.geometry import rodrigues


class PoseGraph(NamedTuple):
    """Edge set of relative-pose measurements.

    ei/ej: [E] int32 camera indices (measurement maps cam ei -> cam ej);
    R_rel: [E, 3, 3]; t_rel: [E, 3] unit-norm translation directions;
    weight: [E] per-edge confidence (e.g. sqrt inlier count), 0 disables.
    """
    ei: jnp.ndarray
    ej: jnp.ndarray
    R_rel: jnp.ndarray
    t_rel: jnp.ndarray
    weight: jnp.ndarray


def _log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Principal log map [3, 3] -> [3], differentiable and stable near 0.

    (geometry.rotation_to_rvec handles the theta ~ pi branch but its argmax
    branch is not smooth; PGO residuals live near identity, where this
    sinc-form is exact and jacfwd-safe.)"""
    cos = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    v = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    # theta / (2 sin theta), Taylor below the switch point
    f = jnp.where(theta < 1e-4,
                  0.5 + theta * theta / 12.0,
                  theta / (2.0 * jnp.sin(theta)))
    # theta ~ pi: v -> 0, so the sinc form collapses an exactly-twisted
    # rotation to a near-zero residual — the robustifier would score such an
    # outlier edge as an inlier. Recover the axis from diag((R + I)/2) =
    # a a^T and return a norm-theta residual (sign from v; arbitrary at
    # exactly pi, where only the norm feeds the Huber weight).
    d = jnp.maximum(jnp.diagonal(R) + 1.0, 1e-12) / 2.0
    axis = jnp.sqrt(d) * jnp.where(v < 0.0, -1.0, 1.0)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-9)
    return jnp.where(cos < -1.0 + 1e-4, theta * axis, f * v)


def _huber_w(norms: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weights (on the residual-vector norm), as in ba._huber_weights."""
    return jnp.where(norms <= delta, 1.0,
                     delta / jnp.maximum(norms, 1e-12))


def _pin(H: jnp.ndarray, g: jnp.ndarray, idx: jnp.ndarray):
    """Gauge-fix: zero rows/cols of the pinned variables + identity diagonal
    (the mask trick of ba.lm_step:160-164)."""
    n = H.shape[0]
    mask = jnp.ones(n).at[idx].set(0.0)
    H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
    return H, g * mask


def average_rotations(Rs: jnp.ndarray, g: PoseGraph, iters: int = 8,
                      huber_delta: float = 0.1,
                      damping: float = 1e-6) -> jnp.ndarray:
    """Huber-IRLS Gauss-Newton rotation averaging. Rs: [C, 3, 3] initial
    world->cam rotations; returns refined [C, 3, 3] with camera 0 pinned."""
    C = Rs.shape[0]

    def residuals(theta, Rs):
        """theta: [C, 3] left-perturbations; per-edge log residuals [E, 3]."""
        P = rodrigues(theta)                               # [C, 3, 3]
        Ri = jnp.einsum("eab,ebc->eac", P[g.ei], Rs[g.ei])
        Rj = jnp.einsum("eab,ebc->eac", P[g.ej], Rs[g.ej])
        pred = jnp.einsum("eab,ebc->eac", g.R_rel, Ri)
        err = jnp.einsum("eab,ecb->eac", Rj, pred)         # Rj pred^T
        return jax.vmap(_log_so3)(err)

    def step(Rs, it):
        z = jnp.zeros((C, 3))
        r0 = residuals(z, Rs)                              # [E, 3]
        rn = jnp.linalg.norm(r0, axis=-1)
        w = _huber_w(rn, huber_delta) * g.weight
        # trimmed IRLS: once the inliers have converged (second half of the
        # schedule), hard-drop gross outlier edges — Huber alone leaves a
        # w ~ delta/r pull that biases the solution by O(delta) per outlier
        w = jnp.where((it >= iters // 2) & (rn > 3.0 * huber_delta), 0.0, w)
        sw = jnp.sqrt(jnp.maximum(w, 0.0))[:, None]
        J = jax.jacfwd(residuals)(z, Rs)                   # [E, 3, C, 3]
        Jf = (J * sw[..., None, None]).reshape(-1, 3 * C)
        rf = (r0 * sw).reshape(-1)
        H = Jf.T @ Jf + damping * jnp.eye(3 * C)
        gvec = -Jf.T @ rf
        H, gvec = _pin(H, gvec, jnp.arange(3))             # pin camera 0
        delta = jnp.linalg.solve(H, gvec).reshape(C, 3)
        Rs2 = jnp.einsum("cab,cbd->cad", rodrigues(delta), Rs)
        # accept only improving steps (degenerate graphs) — under the
        # CURRENT robust weights, else a trimmed outlier vetoes progress
        better = (((residuals(z, Rs2) * sw) ** 2).sum()
                  <= ((r0 * sw) ** 2).sum())
        return jnp.where(better, Rs2, Rs), None

    Rs, _ = jax.lax.scan(step, jnp.asarray(Rs), jnp.arange(iters))
    # re-orthonormalize (GN retraction keeps SO(3) exactly, but guard the
    # accumulated float error over many iterations)
    u, _, vt = jnp.linalg.svd(Rs)
    det = jnp.linalg.det(jnp.einsum("cab,cbd->cad", u, vt))
    u = u * jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det],
                      -1)[:, None, :]
    return jnp.einsum("cab,cbd->cad", u, vt)


def average_translations(Rs: jnp.ndarray, ts: jnp.ndarray, g: PoseGraph,
                         rounds: int = 4,
                         huber_delta: Optional[float] = None,
                         damping: float = 1e-5
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Translation + per-edge-scale averaging with rotations frozen.

    Returns (ts [C, 3], s [E]). Linear problem, solved exactly per IRLS
    round. Gauge: t_0 pinned; sum of edge scales pinned to the init's
    (a strong prior row), so the chain's global scale survives.

    ``damping`` sets an anchor-to-init Tikhonov term (relative to the data
    block's mean diagonal): exactly-null gauge-like directions stay at the
    init instead of drifting per IRLS round. NOTE it cannot rescue
    (near-)COLLINEAR trajectories, where direction noise gives the
    physically-unconstrained modes small FAKE eigenvalues overlapping the
    informative spectrum of healthy graphs — the caller must gate on
    direction diversity instead (pipeline.refine_with_pose_graph; measured
    there: ATE 0.05 -> 0.43 on an 80-frame linear sweep without the gate)."""
    C, E = ts.shape[0], g.ei.shape[0]
    Rrel = g.R_rel

    # init scales by projecting the current pose difference on the edge dir
    s0 = jnp.einsum("ea,ea->e", g.t_rel, ts[g.ej]
                    - jnp.einsum("eab,eb->ea", Rrel, ts[g.ei]))
    s0 = jnp.maximum(s0, 1e-6)
    scale_unit = jnp.maximum(jnp.median(jnp.abs(s0)), 1e-6)
    delta = scale_unit * 0.25 if huber_delta is None else huber_delta

    def edge_res(ts, s):
        return (ts[g.ej] - jnp.einsum("eab,eb->ea", Rrel, ts[g.ei])
                - s[:, None] * g.t_rel)                    # [E, 3]

    def solve(carry, it):
        ts, s = carry
        r0 = edge_res(ts, s)
        rn = jnp.linalg.norm(r0, axis=-1)
        w = _huber_w(rn, delta) * g.weight
        # trimmed IRLS in the later rounds (see average_rotations)
        w = jnp.where((it >= rounds // 2) & (rn > 3.0 * delta), 0.0, w)
        sw = jnp.sqrt(jnp.maximum(w, 0.0))

        # linear system in x = [dt (3C), ds (E)]; build J analytically:
        # rows: 3 per edge + 1 scale-gauge prior
        n = 3 * C + E
        eyeC = jnp.eye(C)
        # d r_e / d t_j = I3, / d t_i = -R_rel, / d s_e = -t_rel
        Jt = (eyeC[g.ej][:, None, :, None] * jnp.eye(3)[None, :, None, :]
              - eyeC[g.ei][:, None, :, None] * Rrel[:, :, None, :])
        Jt = Jt.reshape(E, 3, 3 * C)
        Js = -g.t_rel[..., None] * jnp.eye(E)[:, None, :]  # [E, 3, E]
        J = jnp.concatenate([Jt, Js], axis=-1)             # [E, 3, n]
        Jf = (J * sw[:, None, None]).reshape(3 * E, n)
        rf = (r0 * sw[:, None]).reshape(3 * E)
        # scale-gauge prior: sum(s) ~ sum(s0) removes the monocular
        # global-scale null direction. MODERATE weight only — a huge
        # prior_w annihilates the O(1) data entries of the E x E block in
        # f32 (rank collapse -> NaN solve); the gauge is restored EXACTLY
        # after the solve by rescaling instead.
        prior_w = jnp.sqrt(jnp.maximum(g.weight.sum(), 1.0))
        prow = jnp.concatenate([jnp.zeros(3 * C), jnp.ones(E)]) * prior_w
        r_prior = prior_w * (s - s0).sum()
        H = Jf.T @ Jf + prow[:, None] * prow[None, :]
        # anchor-to-INIT Tikhonov (see ``damping`` in the docstring): in
        # directions the bearing residuals constrain (eigenvalues >> lam_a)
        # the anchor is negligible and rounds converge to the data optimum;
        # in (near-)null directions the solution stays AT the init instead
        # of drifting per-round
        # scaled by the DATA block's mean diagonal only — trace(H) would be
        # dominated by the gauge-prior rank-1 row (prior_w^2 * E), inflating
        # the anchor by orders of magnitude
        lam_a = (damping + 1e-7) * ((Jf ** 2).sum() / n)
        H = H + lam_a * jnp.eye(n)
        anchor = jnp.concatenate([(ts_init - ts).reshape(-1), s0 - s])
        gvec = -Jf.T @ rf - prow * r_prior + lam_a * anchor
        H, gvec = _pin(H, gvec, jnp.arange(3))             # pin t_0
        x = jnp.linalg.solve(H, gvec)
        ts2 = ts + x[:3 * C].reshape(C, 3)
        s2 = s + x[3 * C:]
        # exact gauge restore: residuals are 1-homogeneous in (ts, s) when
        # t_0 = 0 (the usual world frame), so rescaling is
        # optimality-preserving; skipped for a non-origin pinned camera
        lam = s0.sum() / jnp.maximum(s2.sum(), 1e-12)
        # guard: an outlier-heavy round can drive sum(s2) to ~0 or negative
        # (per-edge scales are unconstrained in sign); rescaling would then
        # blow ts/s up to garbage. Keep the un-rescaled iterate instead.
        sane = s2.sum() > 0.05 * s0.sum()
        lam = jnp.where(sane & (jnp.linalg.norm(ts[0]) < 1e-9), lam, 1.0)
        return (ts2 * lam, s2 * lam), None

    ts_init = ts
    (ts, s), _ = jax.lax.scan(solve, (ts, s0), jnp.arange(rounds))
    return ts, s


def optimize_pose_graph(Rs: jnp.ndarray, ts: jnp.ndarray, g: PoseGraph,
                        rot_iters: int = 8, trans_rounds: int = 4,
                        huber_rot: float = 0.1,
                        huber_trans: Optional[float] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full PGO: rotation averaging, then translation/scale averaging.

    Rs [C, 3, 3] / ts [C, 3]: initial world->cam poses (e.g. the chain);
    g: relative measurements. Returns refined (Rs, ts); camera 0 and the
    chain's global scale are preserved (monocular gauge)."""
    Rs = average_rotations(Rs, g, iters=rot_iters, huber_delta=huber_rot)
    ts, _ = average_translations(Rs, ts, g, rounds=trans_rounds,
                                 huber_delta=huber_trans)
    return Rs, ts
