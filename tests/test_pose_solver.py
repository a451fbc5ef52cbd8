"""Batched on-device essential-matrix RANSAC (sfm/pose.py) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from casmtr_tpu.sfm.pose import estimate_pose_batch


def _rotmat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(angle) * K
            + (1 - np.cos(angle)) * K @ K).astype(np.float64)


def _scene(rng, R, t, n=200, n_out=60, noise=0.3, f=400.0, c=320.0):
    """Project random 3D points into two views; append outliers."""
    K = np.array([[f, 0, c], [0, f, c], [0, 0, 1.0]])
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                  rng.uniform(4, 10, n)], axis=1)
    x0 = X / X[:, 2:3]
    X1 = X @ R.T + t
    x1 = X1 / X1[:, 2:3]
    k0 = (x0 @ K.T)[:, :2] + rng.normal(0, noise, (n, 2))
    k1 = (x1 @ K.T)[:, :2] + rng.normal(0, noise, (n, 2))
    k0_out = rng.uniform(0, 2 * c, (n_out, 2))
    k1_out = rng.uniform(0, 2 * c, (n_out, 2))
    kpts0 = np.concatenate([k0, k0_out]).astype(np.float32)
    kpts1 = np.concatenate([k1, k1_out]).astype(np.float32)
    valid = np.ones(n + n_out, bool)
    return kpts0, kpts1, valid, K.astype(np.float32)


def _angles(R_est, t_est, R_gt, t_gt):
    cos_r = (np.trace(R_est.T @ R_gt) - 1) / 2
    r_err = np.degrees(np.arccos(np.clip(cos_r, -1, 1)))
    t_gt_n = t_gt / np.linalg.norm(t_gt)
    cos_t = np.clip(np.dot(t_est, t_gt_n), -1, 1)
    t_err = np.degrees(np.arccos(cos_t))
    return r_err, t_err


def test_pose_batch_recovers_gt(rng):
    """30% outliers, 0.3 px noise: pose within 1 deg of gt for a batch of
    distinct poses; cheirality resolves the translation SIGN (not just the
    axis)."""
    poses = [
        (_rotmat([0, 1, 0], 0.15), np.array([1.0, 0.1, 0.2])),
        (_rotmat([1, 0.5, 0], -0.1), np.array([-0.5, 0.8, 0.1])),
        (_rotmat([0, 0, 1], 0.25), np.array([0.3, -1.0, 0.4])),
    ]
    k0s, k1s, vs, Ks = zip(*[_scene(rng, R, t) for R, t in poses])
    res = jax.jit(estimate_pose_batch, static_argnames=("n_hyp",))(
        jnp.asarray(np.stack(k0s)), jnp.asarray(np.stack(k1s)),
        jnp.asarray(np.stack(vs)), jnp.asarray(np.stack(Ks)),
        jnp.asarray(np.stack(Ks)), n_hyp=512)
    assert bool(res.ok.all())
    for b, (R_gt, t_gt) in enumerate(poses):
        r_err, t_err = _angles(np.asarray(res.R[b], np.float64),
                               np.asarray(res.t[b], np.float64), R_gt, t_gt)
        assert r_err < 1.0, (b, r_err)
        assert t_err < 2.0, (b, t_err)
        # inliers ~ the 200 true correspondences, not the 60 outliers
        n_inl = int(res.n_inliers[b])
        assert 150 <= n_inl <= 230, (b, n_inl)
        assert not np.asarray(res.inliers[b])[200:].sum() > 15


def test_pose_batch_matches_cv2(rng):
    """Same matches through the reference's cv2 path
    (utils/metrics.estimate_pose, reference metrics.py:85-110): both
    estimators land within the same gt error envelope (they are two noisy
    estimates — compare each to gt, not to each other)."""
    import pytest
    cv2 = pytest.importorskip("cv2")
    from casmtr_tpu.utils.metrics import estimate_pose

    R_gt = _rotmat([0.2, 1, 0.1], 0.2)
    t_gt = np.array([0.8, -0.2, 0.3])
    k0, k1, v, K = _scene(rng, R_gt, t_gt)
    ret = estimate_pose(k0.astype(np.float64), k1.astype(np.float64),
                        K.astype(np.float64), K.astype(np.float64), 0.5)
    assert ret is not None
    R_cv, t_cv, _ = ret
    r_cv, t_cv_err = _angles(np.asarray(R_cv), np.asarray(t_cv), R_gt, t_gt)
    res = estimate_pose_batch(jnp.asarray(k0[None]), jnp.asarray(k1[None]),
                              jnp.asarray(v[None]), jnp.asarray(K[None]),
                              jnp.asarray(K[None]))
    r_us, t_us = _angles(np.asarray(res.R[0], np.float64),
                         np.asarray(res.t[0], np.float64), R_gt, t_gt)
    assert r_cv < 1.0 and t_cv_err < 3.0, (r_cv, t_cv_err)
    assert r_us < 1.0 and t_us < 3.0, (r_us, t_us)


def test_pose_batch_masks_and_degenerate(rng):
    """Validity mask honored; too few valid matches -> ok=False."""
    R_gt = _rotmat([0, 1, 0], 0.2)
    t_gt = np.array([1.0, 0.0, 0.2])
    k0, k1, v, K = _scene(rng, R_gt, t_gt, n=80, n_out=0)
    M = k0.shape[0]
    # poison the masked-out rows: they must not affect the estimate
    k0_pad = np.concatenate([k0, rng.uniform(0, 640, (40, 2))
                             .astype(np.float32)])
    k1_pad = np.concatenate([k1, rng.uniform(0, 640, (40, 2))
                             .astype(np.float32)])
    v_pad = np.concatenate([v, np.zeros(40, bool)])
    res = estimate_pose_batch(jnp.asarray(k0_pad[None]),
                              jnp.asarray(k1_pad[None]),
                              jnp.asarray(v_pad[None]),
                              jnp.asarray(K[None]), jnp.asarray(K[None]))
    assert bool(res.ok[0])
    assert int(np.asarray(res.inliers[0])[M:].sum()) == 0
    r_err, t_err = _angles(np.asarray(res.R[0], np.float64),
                           np.asarray(res.t[0], np.float64), R_gt, t_gt)
    assert r_err < 1.0 and t_err < 2.0

    few = np.zeros_like(v_pad)
    few[:6] = True     # under the 8-point minimum
    res2 = estimate_pose_batch(jnp.asarray(k0_pad[None]),
                               jnp.asarray(k1_pad[None]),
                               jnp.asarray(few[None]),
                               jnp.asarray(K[None]), jnp.asarray(K[None]))
    assert not bool(res2.ok[0])
