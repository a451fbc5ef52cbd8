"""Bundle adjustment: Levenberg-Marquardt with Schur-complement landmark
marginalization, designed for multi-host data parallelism.

North-star design (SURVEY.md §2.9 / BASELINE.md): observations are
partitioned across hosts (by keyframe/landmark); every host computes its
partition's contribution to the REDUCED camera system (S, b) after locally
marginalizing its landmarks (the 3x3 point blocks invert in closed form);
`psum` of (S, b) over the mesh then yields the global camera update — the
cross-host traffic is O((6C)^2), independent of landmark count. Single-host
operation is the degenerate case (no psum).

All shapes are static: observations are fixed-size arrays with a validity
mask; invalid observations contribute zeros.

Two solver formulations:

* ``solver="dense"`` — materializes the camera-point cross block B as
  [P, C, 6, 3] f32 (72*P*C bytes) and the reduced camera system S as
  [6C, 6C]; Schur einsum O(P * C^2) FLOPs per LM iteration. Exact direct
  solve; right for small problems (P*C up to ~2e7).
* ``solver="cg"`` — track-structured SPARSE Schur (the reconstruction-scale
  path): B's only nonzero 6x3 blocks sit at observed (point, cam) pairs and
  are exactly the per-observation W_n = Jc_n^T Jp_n, so S is never formed.
  S @ x is applied matrix-free in two gather/segment-sum passes
  (O(N) memory and FLOPs, N = #observations), and the gauge-fixed system is
  solved by preconditioned CG with a block-Jacobi (per-camera 6x6)
  preconditioner. Per-LM-iteration cross-shard traffic is one [C,6] psum
  per CG step plus the [C,6,6] preconditioner blocks — still independent of
  landmark count. This is the standard sparse-BA reduced-camera-system PCG
  (cf. "Bundle Adjustment in the Large" Jacobi-SC preconditioning), laid
  out TPU-style: static shapes, segment sums instead of atomics.

Sharding (either solver): partition the LANDMARKS (and their observations)
across mesh devices with per-shard compact renumbering; only camera-sized
quantities cross shards via psum — verified shard==single in
scripts/sfm_scale_bench.py / tests/test_sfm.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from casmtr_tpu.sfm.geometry import project, rodrigues


class BAProblem(NamedTuple):
    """A batch of observations linking cameras and points.

    cam_rvec: [C, 3]; cam_tvec: [C, 3]; points: [P, 3]; K: [3, 3] (shared
    calibrated intrinsics); obs_cam/obs_pt: [N] int32; obs_uv: [N, 2];
    obs_valid: [N] bool.
    """
    cam_rvec: jnp.ndarray
    cam_tvec: jnp.ndarray
    points: jnp.ndarray
    K: jnp.ndarray
    obs_cam: jnp.ndarray
    obs_pt: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_valid: jnp.ndarray


def reprojection_residuals(p: BAProblem) -> jnp.ndarray:
    """[N, 2] masked residuals."""
    def one(ci, pi, uv):
        return project(p.cam_rvec[ci], p.cam_tvec[ci], p.points[pi], p.K) - uv

    r = jax.vmap(one)(p.obs_cam, p.obs_pt, p.obs_uv)
    return jnp.where(p.obs_valid[:, None], r, 0.0)


def _residual_fn(cam6, X, uv, K):
    return project(cam6[:3], cam6[3:], X, K) - uv


def _huber_weights(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weights for the Huber loss on the 2-vector residual norm:
    w = 1 inside the delta tube, delta/||r|| outside. [N, 1]."""
    n = jnp.linalg.norm(r, axis=-1, keepdims=True)
    return jnp.where(n <= delta, 1.0, delta / jnp.maximum(n, 1e-12))


def robust_cost(p: BAProblem, huber_delta: Optional[float]) -> jnp.ndarray:
    """Sum of rho(||r_n||): squared inside delta, linear outside; plain
    squared cost when huber_delta is None."""
    r = reprojection_residuals(p)
    if huber_delta is None:
        return (r ** 2).sum()
    n = jnp.linalg.norm(r, axis=-1)
    d = huber_delta
    rho = jnp.where(n <= d, n ** 2, 2 * d * n - d * d)
    return jnp.where(p.obs_valid, rho, 0.0).sum()


def _jacobians(p: BAProblem, huber_delta: Optional[float] = None):
    """Per-observation Jacobians J_c [N, 2, 6], J_p [N, 2, 3] and residuals.
    With ``huber_delta``, residuals and Jacobians carry the sqrt of the IRLS
    Huber weight (weights treated as constants within the step — standard
    iteratively-reweighted Gauss-Newton)."""
    cams6 = jnp.concatenate([p.cam_rvec, p.cam_tvec], axis=-1)

    def one(ci, pi, uv):
        c = cams6[ci]
        X = p.points[pi]
        r = _residual_fn(c, X, uv, p.K)
        Jc = jax.jacfwd(_residual_fn, argnums=0)(c, X, uv, p.K)
        Jp = jax.jacfwd(_residual_fn, argnums=1)(c, X, uv, p.K)
        return r, Jc, Jp

    r, Jc, Jp = jax.vmap(one)(p.obs_cam, p.obs_pt, p.obs_uv)
    if huber_delta is not None:
        sw = jnp.sqrt(_huber_weights(r, huber_delta))
        sw = jax.lax.stop_gradient(sw)
        r = r * sw
        Jc = Jc * sw[..., None]
        Jp = Jp * sw[..., None]
    m = p.obs_valid[:, None]
    return (jnp.where(m, r, 0.0), jnp.where(m[..., None], Jc, 0.0),
            jnp.where(m[..., None], Jp, 0.0))


def _schur_system(p: BAProblem, lam: jnp.ndarray,
                  axis_name: Optional[str] = None,
                  huber_delta: Optional[float] = None):
    """Build the reduced camera system (S [6C, 6C], b [6C]) and the point
    back-substitution operators. With ``axis_name``, (S, b) are psum'd across
    the mesh (each shard holding a disjoint set of observations/landmarks)."""
    C = p.cam_rvec.shape[0]
    P = p.points.shape[0]
    r, Jc, Jp = _jacobians(p, huber_delta)

    # camera-diagonal blocks: H_cc[c] = sum_obs Jc^T Jc
    Hcc = jax.ops.segment_sum(
        jnp.einsum("nij,nik->njk", Jc, Jc), p.obs_cam, num_segments=C)
    g_c = jax.ops.segment_sum(
        -jnp.einsum("nij,ni->nj", Jc, r), p.obs_cam, num_segments=C)

    # point blocks: H_pp[p] (3x3), g_p
    Hpp = jax.ops.segment_sum(
        jnp.einsum("nij,nik->njk", Jp, Jp), p.obs_pt, num_segments=P)
    g_p = jax.ops.segment_sum(
        -jnp.einsum("nij,ni->nj", Jp, r), p.obs_pt, num_segments=P)

    # cross blocks aggregated per (point, camera): B [P, C, 6, 3]
    W = jnp.einsum("nij,nik->njk", Jc, Jp)               # [N, 6, 3]
    pc = p.obs_pt * C + p.obs_cam
    B = jax.ops.segment_sum(W, pc, num_segments=P * C).reshape(P, C, 6, 3)

    Vinv = jnp.linalg.inv(Hpp + (lam + 1e-12) * jnp.eye(3)[None])

    # Schur: S = Hcc_diag - sum_p B_p Vinv_p B_p^T ; b = g_c - B Vinv g_p
    S = jnp.zeros((C, 6, C, 6))
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(Hcc)
    BV = jnp.einsum("pcij,pjk->pcik", B, Vinv)
    S = S - jnp.einsum("pcik,pdlk->cidl", BV, B)
    b = g_c - jnp.einsum("pcik,pk->ci", BV, g_p)

    S = S.reshape(6 * C, 6 * C)
    b = b.reshape(6 * C)
    if axis_name is not None:
        S = jax.lax.psum(S, axis_name)
        b = jax.lax.psum(b, axis_name)
    # camera damping after the cross-host reduction
    S = S + lam * jnp.eye(6 * C)
    return S, b, (B, Vinv, g_p)


def _schur_operators(p: BAProblem, lam: jnp.ndarray,
                     axis_name: Optional[str] = None,
                     huber_delta: Optional[float] = None):
    """Track-structured sparse Schur system: matrix-free S @ x, rhs b,
    block-Jacobi preconditioner blocks D [C, 6, 6], and the landmark
    back-substitution operands (W, Vinv, g_p).

    B's nonzero 6x3 blocks are the per-observation W_n = Jc_n^T Jp_n (a
    (point, cam) pair observed k times contributes k summed W_n blocks,
    which the two-pass matvec handles exactly — no uniqueness assumption).
    Under ``axis_name``, observations/landmarks are shard-partitioned and
    only camera-sized reductions ([C,6] per matvec, [C,6,6] once) psum."""
    C = p.cam_rvec.shape[0]
    P = p.points.shape[0]
    r, Jc, Jp = _jacobians(p, huber_delta)

    Hcc = jax.ops.segment_sum(
        jnp.einsum("nij,nik->njk", Jc, Jc), p.obs_cam, num_segments=C)
    g_c = jax.ops.segment_sum(
        -jnp.einsum("nij,ni->nj", Jc, r), p.obs_cam, num_segments=C)
    Hpp = jax.ops.segment_sum(
        jnp.einsum("nij,nik->njk", Jp, Jp), p.obs_pt, num_segments=P)
    g_p = jax.ops.segment_sum(
        -jnp.einsum("nij,ni->nj", Jp, r), p.obs_pt, num_segments=P)
    W = jnp.einsum("nij,nik->njk", Jc, Jp)                 # [N, 6, 3]
    Vinv = jnp.linalg.inv(Hpp + (lam + 1e-12) * jnp.eye(3)[None])

    if axis_name is not None:
        Hcc = jax.lax.psum(Hcc, axis_name)
        g_c = jax.lax.psum(g_c, axis_name)

    # rhs: b = g_c - B Vinv g_p, accumulated per observation
    Vg = jnp.einsum("pjk,pk->pj", Vinv, g_p)               # [P, 3]
    b = jax.ops.segment_sum(
        jnp.einsum("nij,nj->ni", W, Vg[p.obs_pt]), p.obs_cam, num_segments=C)
    if axis_name is not None:
        b = jax.lax.psum(b, axis_name)
    b = g_c - b

    def matvec(x):                                          # x: [C, 6]
        # (B^T x) gathered per observation, reduced per landmark
        t = jax.ops.segment_sum(
            jnp.einsum("nij,ni->nj", W, x[p.obs_cam]),
            p.obs_pt, num_segments=P)                       # [P, 3]
        y = jnp.einsum("pjk,pk->pj", Vinv, t)
        z = jax.ops.segment_sum(
            jnp.einsum("nij,nj->ni", W, y[p.obs_pt]),
            p.obs_cam, num_segments=C)                      # [C, 6]
        if axis_name is not None:
            z = jax.lax.psum(z, axis_name)
        return jnp.einsum("cij,cj->ci", Hcc, x) + lam * x - z

    # block-Jacobi preconditioner: per-camera diagonal 6x6 of S (the
    # same-observation term of the Schur product; duplicate-(p,c) cross
    # terms are dropped — a preconditioner needn't be exact)
    WVW = jax.ops.segment_sum(
        jnp.einsum("nij,njk,nlk->nil", W, Vinv[p.obs_pt], W),
        p.obs_cam, num_segments=C)
    if axis_name is not None:
        WVW = jax.lax.psum(WVW, axis_name)
    D = Hcc + lam * jnp.eye(6)[None] - WVW
    return matvec, b, D, (W, Vinv, g_p)


def _pcg(matvec, b, Dinv, iters: int, tol: float,
         axis_name: Optional[str] = None):
    """Preconditioned conjugate gradients on the gauge-fixed reduced camera
    system. All iterates are camera-sized [C, 6] and (under shard_map)
    value-replicated — the psum inside ``matvec`` is the only collective.

    f32 accuracy note: S @ x is Hcc @ x - B Vinv B^T x, two large cancelling
    terms, so the matvec carries ~1e-3 relative rounding; CG stalls there
    rather than at tol. LM absorbs inexact steps (standard inexact-Newton
    behavior) — tests assert cost parity vs the dense direct solve, not
    bitwise camera equality."""
    def prec(r):
        return jnp.einsum("cij,cj->ci", Dinv, r)

    def dot(a, c):
        return jnp.sum(a * c)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = prec(r0)
    rz0 = dot(r0, z0)
    stop = jnp.maximum(tol * tol * dot(b, prec(b)), 1e-30)

    def cond(c):
        i, _, _, _, _, rz = c
        return (i < iters) & (rz > stop)

    def body(c):
        i, x, r, z, pv, rz = c
        Ap = matvec(pv)
        alpha = rz / jnp.maximum(dot(pv, Ap), 1e-30)
        x = x + alpha * pv
        r = r - alpha * Ap
        z = prec(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        return i + 1, x, r, z, z + beta * pv, rz_new

    init = (jnp.int32(0), x0, r0, z0, z0, rz0)
    if axis_name is not None:
        # under shard_map the carry becomes device-varying after the psum'd
        # matvec; mark replicated initial-carry leaves accordingly (same
        # pattern as run_ba's scan carry)
        def mark(x):
            try:
                if axis_name in jax.typeof(x).vma:
                    return x
            except Exception:
                pass
            return jax.lax.pcast(x, (axis_name,), to="varying")

        init = jax.tree_util.tree_map(mark, init)
    _, x, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return x


def lm_step(p: BAProblem, lam: jnp.ndarray,
            axis_name: Optional[str] = None,
            fix_first_cam: bool = True,
            huber_delta: Optional[float] = None,
            solver: str = "dense",
            cg_iters: int = 100,
            cg_tol: float = 1e-6
            ) -> Tuple[BAProblem, jnp.ndarray]:
    """One damped Gauss-Newton (LM) step. Returns (updated problem, new cost).

    fix_first_cam pins the gauge: camera 0's update is zeroed.
    solver="dense": direct solve of the materialized [6C, 6C] system;
    solver="cg": matrix-free sparse Schur + preconditioned CG (module
    docstring) — the reconstruction-scale path.
    """
    C = p.cam_rvec.shape[0]
    if solver == "cg":
        matvec, b, D, (W, Vinv, g_p) = _schur_operators(
            p, lam, axis_name, huber_delta)
        m = jnp.ones((C, 6))
        if fix_first_cam:
            m = m.at[0].set(0.0)
            D = D.at[0].set(jnp.eye(6))

        def op(x):
            # gauge-projected operator: identity on the pinned block
            return m * matvec(m * x) + (1.0 - m) * x

        dc = _pcg(op, m * b, jnp.linalg.inv(D), cg_iters, cg_tol,
                  axis_name=axis_name)
        dc = m * dc
        # back-substitute landmarks (shard-local): dp = Vinv (g_p - B^T dc)
        t = jax.ops.segment_sum(
            jnp.einsum("nij,ni->nj", W, dc[p.obs_cam]),
            p.obs_pt, num_segments=p.points.shape[0])
        dp = jnp.einsum("pjk,pk->pj", Vinv, g_p - t)
    elif solver == "dense":
        S, b, (B, Vinv, g_p) = _schur_system(p, lam, axis_name, huber_delta)

        if fix_first_cam:
            # pin the first camera by zeroing its rows/cols + identity block
            mask = jnp.ones(6 * C).at[:6].set(0.0)
            S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            b = b * mask

        dc = jnp.linalg.solve(S, b).reshape(C, 6)

        # back-substitute landmarks: dp = Vinv (g_p - sum_c B^T dc). Under
        # shard_map each shard owns its landmarks; dp for foreign landmarks
        # is zero because their B/g_p contributions are zero on this shard.
        rhs = g_p - jnp.einsum("pcij,ci->pj", B, dc)
        dp = jnp.einsum("pjk,pk->pj", Vinv, rhs)
    else:
        raise ValueError(f"unknown BA solver {solver!r}")

    new = p._replace(
        cam_rvec=p.cam_rvec + dc[:, :3],
        cam_tvec=p.cam_tvec + dc[:, 3:],
        points=p.points + dp)
    cost = robust_cost(new, huber_delta)
    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)
    return new, cost


def run_ba(p: BAProblem, iters: int = 20, lam0: float = 1e-3,
           axis_name: Optional[str] = None,
           huber_delta: Optional[float] = None,
           solver: str = "dense",
           cg_iters: int = 100,
           cg_tol: float = 1e-6
           ) -> Tuple[BAProblem, jnp.ndarray]:
    """LM loop with multiplicative damping adaptation (accept/reject).

    ``huber_delta`` (px) enables the Huber robust loss: IRLS-weighted
    Gauss-Newton steps, accept/reject and the returned cost in rho units.
    ``solver="cg"`` selects the sparse matrix-free Schur path (module
    docstring) for reconstruction-scale problems."""

    def cost_of(q):
        c = robust_cost(q, huber_delta)
        return jax.lax.psum(c, axis_name) if axis_name else c

    def body(carry, _):
        q, lam, cost = carry
        q2, cost2 = lm_step(q, lam, axis_name, huber_delta=huber_delta,
                            solver=solver, cg_iters=cg_iters, cg_tol=cg_tol)
        accept = cost2 < cost
        # select only the optimized leaves (keeps carry dtypes exact)
        q = q._replace(
            cam_rvec=jnp.where(accept, q2.cam_rvec, q.cam_rvec),
            cam_tvec=jnp.where(accept, q2.cam_tvec, q.cam_tvec),
            points=jnp.where(accept, q2.points, q.points))
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        cost = jnp.where(accept, cost2, cost).astype(jnp.float32)
        return (q, lam, cost), cost

    init = (p, jnp.asarray(lam0, jnp.float32),
            cost_of(p).astype(jnp.float32))
    if axis_name is not None:
        # under shard_map the carry becomes device-varying after the first
        # psum'd step; mark replicated initial-carry leaves accordingly
        def mark(x):
            try:
                if axis_name in jax.typeof(x).vma:
                    return x
            except Exception:
                pass
            return jax.lax.pcast(x, (axis_name,), to="varying")

        init = jax.tree_util.tree_map(mark, init)
    (q, _, cost), _ = jax.lax.scan(body, init, None, length=iters)
    return q, cost
