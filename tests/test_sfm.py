"""SfM engine tests on synthetic scenes: triangulation, Schur-complement BA
convergence, multi-shard (psum) equivalence, chain reconstruction ATE."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from casmtr_tpu.sfm import ba as ba_mod
from casmtr_tpu.sfm import geometry as G
from casmtr_tpu.sfm import reconstruct as Rc


def synth_scene(rng, C=4, P=60, noise=0.0):
    K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
    pts = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P),
                    rng.uniform(5, 9, P)], -1)
    rvecs, tvecs, obs = [], [], []
    for c in range(C):
        rv = np.array([0.0, 0.04 * c, 0.0])
        tv = np.array([-0.4 * c, 0.02 * c, 0.0])
        rvecs.append(rv)
        tvecs.append(tv)
        uv = np.asarray(G.project(jnp.asarray(rv), jnp.asarray(tv),
                                  jnp.asarray(pts), jnp.asarray(K)))
        if noise:
            uv = uv + rng.normal(0, noise, uv.shape)
        obs.append(uv)
    obs_cam = np.repeat(np.arange(C), P).astype(np.int32)
    obs_pt = np.tile(np.arange(P), C).astype(np.int32)
    obs_uv = np.concatenate(obs, 0).astype(np.float32)
    return (np.stack(rvecs), np.stack(tvecs), pts, K,
            obs_cam, obs_pt, obs_uv)


def test_rodrigues_roundtrip(rng):
    rv = rng.standard_normal(3) * 0.7
    R = np.asarray(G.rodrigues(jnp.asarray(rv)))
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
    rv2 = np.asarray(G.rotation_to_rvec(jnp.asarray(R)))
    np.testing.assert_allclose(rv2, rv, atol=1e-5)


def test_triangulation_exact(rng):
    rvecs, tvecs, pts, K, oc, op, ouv = synth_scene(rng, C=2, P=20)
    P0 = K @ np.concatenate([np.asarray(G.rodrigues(jnp.asarray(rvecs[0]))),
                             tvecs[0][:, None]], 1)
    P1 = K @ np.concatenate([np.asarray(G.rodrigues(jnp.asarray(rvecs[1]))),
                             tvecs[1][:, None]], 1)
    X = np.asarray(Rc.triangulate(jnp.asarray(P0), jnp.asarray(P1),
                                  jnp.asarray(ouv[:20]),
                                  jnp.asarray(ouv[20:40])))
    np.testing.assert_allclose(X, pts, atol=1e-3)


def make_problem(rng, noise=0.5, perturb=0.02, C=4, P=60):
    rvecs, tvecs, pts, K, oc, op, ouv = synth_scene(rng, C=C, P=P,
                                                    noise=noise)
    return ba_mod.BAProblem(
        cam_rvec=jnp.asarray((rvecs + rng.normal(0, perturb, rvecs.shape))
                             .astype(np.float32)),
        cam_tvec=jnp.asarray((tvecs + rng.normal(0, perturb, tvecs.shape))
                             .astype(np.float32)),
        points=jnp.asarray((pts + rng.normal(0, perturb * 5, pts.shape))
                           .astype(np.float32)),
        K=jnp.asarray(K.astype(np.float32)),
        obs_cam=jnp.asarray(oc), obs_pt=jnp.asarray(op),
        obs_uv=jnp.asarray(ouv),
        obs_valid=jnp.ones(len(oc), bool))


def test_ba_reduces_cost(rng):
    p = make_problem(rng)
    c0 = float((ba_mod.reprojection_residuals(p) ** 2).sum())
    q, cost = jax.jit(lambda p: ba_mod.run_ba(p, iters=15))(p)
    assert float(cost) < 0.05 * c0
    # with 0.5px noise, final mean reprojection error should be ~noise level
    n_obs = int(p.obs_valid.sum())
    rms = np.sqrt(float(cost) / n_obs / 2)
    assert rms < 1.5


def test_ba_multishard_matches_single(rng):
    """Sharded BA (observations split across a 2-device mesh, psum'd Schur
    systems) must match the single-device result."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    p = make_problem(rng, C=3, P=40)
    q_single, cost_single = ba_mod.run_ba(p, iters=5)

    # reorder observations POINT-major so reshape(2, ...) partitions the
    # LANDMARKS across shards (the design invariant: each landmark is wholly
    # owned by one shard; only the camera system crosses shards via psum)
    order = np.argsort(np.asarray(p.obs_pt), kind="stable")
    p = p._replace(obs_cam=p.obs_cam[order], obs_pt=p.obs_pt[order],
                   obs_uv=p.obs_uv[order], obs_valid=p.obs_valid[order])

    devs = jax.devices()[:2]
    mesh = Mesh(np.asarray(devs), ("shard",))
    n = p.obs_uv.shape[0]
    assert n % 2 == 0

    @jax.jit
    def sharded(p):
        def inner(obs_cam, obs_pt, obs_uv, obs_valid):
            local = p._replace(obs_cam=obs_cam[0], obs_pt=obs_pt[0],
                               obs_uv=obs_uv[0], obs_valid=obs_valid[0])
            q, cost = ba_mod.run_ba(local, iters=5, axis_name="shard")
            return (q.cam_rvec[None], q.cam_tvec[None], cost[None])

        return shard_map(
            inner, mesh=mesh,
            in_specs=(P("shard"), P("shard"), P("shard"), P("shard")),
            out_specs=(P("shard"), P("shard"), P("shard")),
        )(p.obs_cam.reshape(2, -1), p.obs_pt.reshape(2, -1),
          p.obs_uv.reshape(2, -1, 2), p.obs_valid.reshape(2, -1))

    rv, tv, costs = sharded(p)
    np.testing.assert_allclose(np.asarray(costs)[0], np.asarray(costs)[1],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(costs)[0],
                               float(cost_single), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rv)[0], np.asarray(q_single.cam_rvec),
                               atol=1e-4)


def test_ba_sparse_cg_matches_dense(rng):
    """solver="cg" (matrix-free sparse Schur + PCG) must reproduce the dense
    direct solve's converged cost; cameras agree to inexact-Newton slack.

    The CG matvec (Hcc x - B Vinv B^T x) carries ~1e-3 relative f32
    cancellation noise, so steps are inexact and accept/reject compounds the
    difference — cost parity is the convergence oracle, camera parameters
    are bounded-delta (see _pcg docstring)."""
    p = make_problem(rng, C=5, P=80)
    q_d, c_d = jax.jit(lambda q: ba_mod.run_ba(q, iters=8))(p)
    q_s, c_s = jax.jit(lambda q: ba_mod.run_ba(
        q, iters=8, solver="cg", cg_iters=200, cg_tol=1e-8))(p)
    np.testing.assert_allclose(float(c_s), float(c_d), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(q_s.cam_rvec),
                               np.asarray(q_d.cam_rvec), atol=1e-2)
    np.testing.assert_allclose(np.asarray(q_s.cam_tvec),
                               np.asarray(q_d.cam_tvec), atol=1e-2)


def test_ba_sparse_cg_huber_and_duplicates(rng):
    """The sparse matvec makes no (point,cam)-uniqueness assumption: with
    duplicated observations and Huber weighting it still matches dense."""
    p = make_problem(rng, noise=0.4, C=4, P=50)
    # duplicate a slice of observations (same (p,c) pairs seen twice)
    sl = slice(0, 40)
    p = p._replace(
        obs_cam=jnp.concatenate([p.obs_cam, p.obs_cam[sl]]),
        obs_pt=jnp.concatenate([p.obs_pt, p.obs_pt[sl]]),
        obs_uv=jnp.concatenate([p.obs_uv, p.obs_uv[sl]]),
        obs_valid=jnp.concatenate([p.obs_valid, p.obs_valid[sl]]))
    q_d, c_d = ba_mod.run_ba(p, iters=6, huber_delta=2.0)
    q_s, c_s = ba_mod.run_ba(p, iters=6, huber_delta=2.0,
                             solver="cg", cg_iters=200, cg_tol=1e-8)
    np.testing.assert_allclose(float(c_s), float(c_d), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(q_s.cam_tvec),
                               np.asarray(q_d.cam_tvec), atol=1e-2)


def test_ba_sparse_multishard_matches_single(rng):
    """Sharded sparse-CG BA (landmarks partitioned, [C,6] psum per CG step)
    must match the single-device sparse result."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    p = make_problem(rng, C=3, P=40)
    q_single, cost_single = ba_mod.run_ba(p, iters=5, solver="cg",
                                          cg_iters=150, cg_tol=1e-8)

    order = np.argsort(np.asarray(p.obs_pt), kind="stable")
    p = p._replace(obs_cam=p.obs_cam[order], obs_pt=p.obs_pt[order],
                   obs_uv=p.obs_uv[order], obs_valid=p.obs_valid[order])

    devs = jax.devices()[:2]
    mesh = Mesh(np.asarray(devs), ("shard",))
    n = p.obs_uv.shape[0]
    assert n % 2 == 0

    @jax.jit
    def sharded(p):
        def inner(obs_cam, obs_pt, obs_uv, obs_valid):
            local = p._replace(obs_cam=obs_cam[0], obs_pt=obs_pt[0],
                               obs_uv=obs_uv[0], obs_valid=obs_valid[0])
            q, cost = ba_mod.run_ba(local, iters=5, axis_name="shard",
                                    solver="cg", cg_iters=150, cg_tol=1e-8)
            return (q.cam_rvec[None], q.cam_tvec[None], cost[None])

        return shard_map(
            inner, mesh=mesh,
            in_specs=(P("shard"), P("shard"), P("shard"), P("shard")),
            out_specs=(P("shard"), P("shard"), P("shard")),
        )(p.obs_cam.reshape(2, -1), p.obs_pt.reshape(2, -1),
          p.obs_uv.reshape(2, -1, 2), p.obs_valid.reshape(2, -1))

    rv, tv, costs = sharded(p)
    np.testing.assert_allclose(np.asarray(costs)[0], np.asarray(costs)[1],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(costs)[0],
                               float(cost_single), rtol=1e-3)
    # psum reduction order perturbs the inexact-CG steps; bounded-delta
    # camera agreement (cost parity above is the convergence oracle)
    np.testing.assert_allclose(np.asarray(rv)[0],
                               np.asarray(q_single.cam_rvec), atol=1e-2)


def test_chain_reconstruction_ate(rng):
    """Two-view chain + BA on synthetic tracks: ATE after alignment is small."""
    rvecs, tvecs, pts, K, oc, op, ouv = synth_scene(rng, C=4, P=60,
                                                    noise=0.3)
    # relative poses between consecutive cams (ground truth + slight noise)
    pairwise = []
    for c in range(3):
        R0 = np.asarray(G.rodrigues(jnp.asarray(rvecs[c])))
        R1 = np.asarray(G.rodrigues(jnp.asarray(rvecs[c + 1])))
        R_rel = R1 @ R0.T
        t_rel = tvecs[c + 1] - R_rel @ tvecs[c]
        pairwise.append((R_rel, t_rel + rng.normal(0, 0.01, 3)))
    Rs, ts = Rc.chain_poses(pairwise)

    tracks = {}
    for pid in range(60):
        tracks[pid] = [(c, ouv[c * 60 + pid]) for c in range(4)]
    prob = Rc.build_problem(Rs, ts, K, tracks)
    q, cost = ba_mod.run_ba(prob, iters=15)

    centers_gt = np.stack([
        -np.asarray(G.rodrigues(jnp.asarray(rvecs[c]))).T @ tvecs[c]
        for c in range(4)])
    ate_before = Rc.ate_rmse(Rc.camera_centers(prob), centers_gt)
    ate_after = Rc.ate_rmse(Rc.camera_centers(q), centers_gt)
    assert ate_after <= ate_before + 1e-6
    assert ate_after < 0.05


def test_ba_huber_outlier_robustness(rng):
    """Gross outlier observations wreck plain least-squares BA; the Huber
    IRLS variant recovers camera translations to near the clean optimum."""
    p = make_problem(rng, noise=0.3, perturb=0.02, C=4, P=60)
    # corrupt 5% of observations by ~80 px
    n = p.obs_uv.shape[0]
    n_bad = n // 20
    bad = rng.choice(n, n_bad, replace=False)
    uv = np.asarray(p.obs_uv).copy()
    uv[bad] += rng.normal(0, 80, (n_bad, 2))
    p_bad = p._replace(obs_uv=jnp.asarray(uv.astype(np.float32)))

    q_ls, _ = ba_mod.run_ba(p_bad, iters=15)
    q_hb, _ = ba_mod.run_ba(p_bad, iters=15, huber_delta=2.0)

    # compare against the clean-data fit via similarity-aligned ATE of
    # camera centers (raw tvec diffs are dominated by the monocular scale
    # gauge, which the outliers shift)
    q_ref, _ = ba_mod.run_ba(p, iters=15)
    c_ref = Rc.camera_centers(q_ref)
    ate_ls = Rc.ate_rmse(Rc.camera_centers(q_ls), c_ref)
    ate_hb = Rc.ate_rmse(Rc.camera_centers(q_hb), c_ref)
    assert ate_hb < 0.25 * ate_ls, (ate_hb, ate_ls)
    assert ate_hb < 0.02, ate_hb


def test_ba_huber_equals_ls_inside_tube(rng):
    """With all residuals far inside the delta tube, Huber == plain LS."""
    p = make_problem(rng, noise=0.1, perturb=0.01)
    q_ls, c_ls = ba_mod.run_ba(p, iters=10)
    q_hb, c_hb = ba_mod.run_ba(p, iters=10, huber_delta=50.0)
    np.testing.assert_allclose(np.asarray(q_hb.cam_tvec),
                               np.asarray(q_ls.cam_tvec), atol=1e-5)
    np.testing.assert_allclose(float(c_hb), float(c_ls), rtol=1e-5)


def test_rotation_to_rvec_pi_branch():
    """theta ~ pi: the skew part vanishes; the diagonal branch must recover
    the axis (sign ambiguity is inherent — compare the rotations)."""
    import numpy as np
    import jax.numpy as jnp
    from casmtr_tpu.sfm import geometry as G

    for axis in ([1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0],
                 [0.6, 0.8, 0.0], [0.36, 0.48, 0.8]):
        rv = np.pi * np.asarray(axis)
        R = np.asarray(G.rodrigues(jnp.asarray(rv)))
        rv2 = np.asarray(G.rotation_to_rvec(jnp.asarray(R)))
        R2 = np.asarray(G.rodrigues(jnp.asarray(rv2)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_triangulate_degenerate_is_finite():
    """Zero-baseline (pure rotation) pairs must produce FINITE points (the
    cheirality mask rejects them downstream; NaN would poison the BA cost)."""
    import numpy as np
    import jax.numpy as jnp
    from casmtr_tpu.sfm.geometry import triangulate

    K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]])
    P = K @ np.eye(3, 4)
    uv = np.array([[42.0, 31.0], [10.0, 50.0]])
    X = np.asarray(triangulate(jnp.asarray(P), jnp.asarray(P),
                               jnp.asarray(uv), jnp.asarray(uv)))
    assert np.all(np.isfinite(X))


def test_build_problem_capacity_and_cheirality():
    import numpy as np
    import pytest
    from casmtr_tpu.sfm.reconstruct import build_problem

    K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]])
    Rs = np.stack([np.eye(3), np.eye(3)])
    ts = np.stack([np.zeros(3), np.array([-0.5, 0, 0])])
    # one sane track (in front) and one behind-camera track (uvs crossed so
    # DLT triangulates to negative depth)
    front = {0: [(0, np.array([45.0, 30.0])), (1, np.array([40.0, 30.0]))]}
    X = np.array([0.3, 0.0, 5.0])
    uv0 = (K @ X)[:2] / X[2]
    X1 = Rs[1] @ X + ts[1]
    uv1 = (K @ X1)[:2] / X1[2]
    behind = [(0, np.asarray(uv1)), (1, np.asarray(uv0))]  # swapped views
    p = build_problem(Rs, ts, K, {0: front[0], 1: behind})
    ok = np.asarray(p.obs_valid)
    assert ok[:2].all()          # the sane track's observations survive
    assert not ok[2:4].all()     # the crossed track is masked (z <= 0)

    with pytest.raises(ValueError, match="max_obs"):
        build_problem(Rs, ts, K, front, max_obs=1)
