"""Pose-graph optimization tests (casmtr_tpu/sfm/pose_graph.py): rotation
averaging, translation/scale averaging with the monocular gauge, drift
cancellation on loopy synthetic graphs, and the pipeline integration."""

import numpy as np
import jax.numpy as jnp

from casmtr_tpu.sfm import geometry as G
from casmtr_tpu.sfm import pipeline as pl
from casmtr_tpu.sfm import reconstruct as Rc
from casmtr_tpu.sfm.pose_graph import (PoseGraph, average_rotations,
                                       average_translations,
                                       optimize_pose_graph)

from test_sfm_pipeline import synth_sequence


# ---------------------------------------------------------------------------
# synthetic pose-graph helpers
# ---------------------------------------------------------------------------

def _rot(rvec):
    return np.asarray(G.rodrigues(jnp.asarray(np.asarray(rvec, np.float64))))


def make_trajectory(C, rng, turn=0.12, step=1.0):
    """Ground-truth world->cam poses along a gently turning path."""
    Rs, ts = [], []
    R = np.eye(3)
    c = np.zeros(3)
    for i in range(C):
        Rs.append(R)
        ts.append(-R @ c)
        R = _rot([0.0, turn, 0.0]) @ R
        c = c + R.T @ np.array([step, 0.0, 0.05])
    return np.stack(Rs), np.stack(ts)


def graph_from_gt(Rs, ts, edges, rng, rot_noise=0.0, dir_noise=0.0):
    """Relative measurements R_ij = R_j R_i^T (noised), t unit direction."""
    ei, ej, Rr, tr = [], [], [], []
    for i, j in edges:
        Rij = Rs[j] @ Rs[i].T
        tij = ts[j] - Rij @ ts[i]
        if rot_noise:
            Rij = _rot(rng.normal(0, rot_noise, 3)) @ Rij
        if dir_noise:
            tij = tij + rng.normal(0, dir_noise * np.linalg.norm(tij), 3)
        ei.append(i)
        ej.append(j)
        Rr.append(Rij)
        tr.append(tij / max(np.linalg.norm(tij), 1e-12))
    E = len(ei)
    return PoseGraph(jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
                     jnp.asarray(np.stack(Rr), jnp.float32),
                     jnp.asarray(np.stack(tr), jnp.float32),
                     jnp.ones(E, jnp.float32))


def drifted_init(Rs, ts, rng, rot_drift=0.03, t_drift=0.08):
    """Chain-style init: error grows along the trajectory (camera 0 exact)."""
    C = len(Rs)
    R0, t0 = [Rs[0]], [ts[0]]
    for i in range(1, C):
        R0.append(_rot(rng.normal(0, rot_drift * np.sqrt(i), 3)) @ Rs[i])
        t0.append(ts[i] + rng.normal(0, t_drift * np.sqrt(i), 3))
    return np.stack(R0), np.stack(t0)


def rot_err_deg(Ra, Rb):
    cos = np.clip((np.trace(Ra @ Rb.T) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(cos))


def skip_edges(C, overlaps=(1, 2, 3)):
    return [(i, i + d) for d in overlaps for i in range(C - d)]


# ---------------------------------------------------------------------------


def test_rotation_averaging_exact_measurements():
    """Perfect relative rotations + drifted init -> near-exact recovery;
    camera 0 stays pinned."""
    rng = np.random.default_rng(0)
    Rs, ts = make_trajectory(10, rng)
    g = graph_from_gt(Rs, ts, skip_edges(10), rng)
    R0, _ = drifted_init(Rs, ts, rng)
    R2 = np.asarray(average_rotations(jnp.asarray(R0, jnp.float32), g))
    np.testing.assert_allclose(R2[0], Rs[0], atol=1e-5)
    errs = [rot_err_deg(R2[i], Rs[i]) for i in range(10)]
    errs0 = [rot_err_deg(R0[i], Rs[i]) for i in range(10)]
    assert max(errs) < 0.1, (max(errs), max(errs0))   # f32 GN floor
    # orthonormality survives
    for R in R2:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_translation_averaging_recovers_centers_and_scale():
    """With rotations exact, translation+scale averaging recovers positions
    from unit directions while preserving the initialization's global
    scale (monocular gauge)."""
    rng = np.random.default_rng(1)
    Rs, ts = make_trajectory(8, rng)
    g = graph_from_gt(Rs, ts, skip_edges(8), rng)
    _, t0 = drifted_init(Rs, ts, rng, rot_drift=0.0, t_drift=0.1)
    t2, s = average_translations(jnp.asarray(Rs, jnp.float32),
                                 jnp.asarray(t0, jnp.float32), g)
    t2 = np.asarray(t2)
    np.testing.assert_allclose(t2[0], ts[0], atol=1e-5)   # pinned
    # the global scale is a gauge preserved from the (noisy) init, so
    # compare up to one scalar: after optimal scaling the solution is tight,
    # and the preserved scale itself is close to gt (init noise averages out
    # over the edge-scale sum)
    lam = float((t2 * ts).sum() / np.maximum((t2 * t2).sum(), 1e-12))
    assert abs(lam - 1) < 0.1, lam
    err2 = np.linalg.norm(lam * t2 - ts, axis=-1).max()
    err0 = np.linalg.norm(t0 - ts, axis=-1).max()
    assert err2 < 0.02 and err2 < err0 / 3, (err0, err2)
    # recovered per-edge scales match the gt baselines up to the same gauge
    s = np.asarray(s)
    gt_s = np.array([np.linalg.norm(ts[j] - (Rs[j] @ Rs[i].T) @ ts[i])
                     for i, j in skip_edges(8)])
    np.testing.assert_allclose(lam * s, gt_s, rtol=0.05)


def test_pgo_cancels_chain_drift_with_loop():
    """A loopy graph (skip edges + one long loop edge) pulls a drifted chain
    back toward ground truth — the whole point of PGO."""
    rng = np.random.default_rng(2)
    C = 14
    Rs, ts = make_trajectory(C, rng, turn=2 * np.pi / C)
    edges = skip_edges(C, (1, 2)) + [(0, C - 1), (0, C // 2)]
    # drift must dominate the measurement-noise floor: direction-only
    # edges at noise eps constrain the trajectory's far end only to
    # O(eps * |t| * C) — the optimum is NOT gt under heavy noise
    g = graph_from_gt(Rs, ts, edges, rng, rot_noise=0.002, dir_noise=0.002)
    R0, t0 = drifted_init(Rs, ts, rng, rot_drift=0.03, t_drift=0.15)
    R2, t2 = optimize_pose_graph(jnp.asarray(R0, jnp.float32),
                                 jnp.asarray(t0, jnp.float32), g)
    R2, t2 = np.asarray(R2), np.asarray(t2)
    rot0 = max(rot_err_deg(R0[i], Rs[i]) for i in range(C))
    rot2 = max(rot_err_deg(R2[i], Rs[i]) for i in range(C))
    tr0 = np.linalg.norm(t0 - ts, axis=-1).max()
    tr2 = np.linalg.norm(t2 - ts, axis=-1).max()
    assert rot2 < rot0 / 2, (rot0, rot2)
    assert tr2 < tr0 / 2, (tr0, tr2)


def test_pgo_huber_rejects_gross_outlier_edge():
    """One grossly wrong relative rotation must not poison the solution."""
    rng = np.random.default_rng(3)
    C = 10
    Rs, ts = make_trajectory(C, rng)
    g = graph_from_gt(Rs, ts, skip_edges(C), rng)
    # corrupt edge 5 with a 60-degree error
    Rbad = np.asarray(g.R_rel).copy()
    Rbad[5] = _rot([0.0, 1.05, 0.0]) @ Rbad[5]
    gbad = g._replace(R_rel=jnp.asarray(Rbad))
    R0, _ = drifted_init(Rs, ts, rng)
    R2 = np.asarray(average_rotations(jnp.asarray(R0, jnp.float32), gbad))
    errs = [rot_err_deg(R2[i], Rs[i]) for i in range(C)]
    assert max(errs) < 1.0, max(errs)


def test_refine_with_pose_graph_noop_without_redundancy():
    """With only chain edges (E == C-1 < C) the helper returns the input."""
    rng = np.random.default_rng(4)
    Rs, ts = make_trajectory(5, rng)
    pair_poses = {(i, i + 1): (Rs[i + 1] @ Rs[i].T,
                               np.array([1.0, 0, 0]), np.ones(50, bool))
                  for i in range(4)}
    R2, t2 = pl.refine_with_pose_graph(Rs, ts, pair_poses, list(range(5)))
    assert R2 is Rs and t2 is ts


def test_refine_with_pose_graph_skips_failed_pairs():
    """Failed-RANSAC entries (inl None) contribute no edge; with enough
    healthy edges the refinement still runs and improves the init."""
    rng = np.random.default_rng(5)
    C = 8
    Rs, ts = make_trajectory(C, rng)
    pair_poses = {}
    for i, j in skip_edges(C, (1, 2)):
        Rij = Rs[j] @ Rs[i].T
        tij = ts[j] - Rij @ ts[i]
        pair_poses[(i, j)] = (Rij, tij / np.linalg.norm(tij),
                              np.ones(60, bool))
    pair_poses[(0, 2)] = (np.eye(3), np.array([0, 0, 1e-3]), None)  # failed
    R0, t0 = drifted_init(Rs, ts, rng)
    R2, t2 = pl.refine_with_pose_graph(R0, t0, pair_poses, list(range(C)))
    rot0 = max(rot_err_deg(R0[i], Rs[i]) for i in range(C))
    rot2 = max(rot_err_deg(R2[i], Rs[i]) for i in range(C))
    assert rot2 < rot0 / 2, (rot0, rot2)


def test_reconstruct_sequence_with_pgo(rng):
    """Full pipeline with pgo=True on the synthetic sequence still converges
    (BA cost small, ATE small) — PGO composes with chain init + BA."""
    match_fn, K, centers_gt = synth_sequence(rng, n_frames=6, noise=0.2)
    res = pl.reconstruct_sequence(match_fn, 6, K, keyframes=list(range(6)),
                                  overlaps=(1, 2), ba_iters=15, pgo=True)
    n_obs = int(np.asarray(res.problem.obs_valid).sum())
    rms = np.sqrt(res.cost / max(n_obs, 1) / 2)
    assert rms < 2.0, rms
    centers = Rc.camera_centers(res.problem)
    assert Rc.ate_rmse(centers, centers_gt) < 0.1
