"""Data-parallel correctness: the GSPMD-sharded train step over the 8-device
mesh must equal the single-device step bit-for-bit up to fp association —
this pins the gradient psum and the global-batch BatchNorm claims
(SURVEY.md §2.9; reference trains DDP+SyncBN, train.py:140)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from casmtr_tpu.configs import build_config


def _tiny_full_cfg():
    return build_config("outdoor_casmtr_4c", overrides={"loftr": {
        "backbone": {"backbone_type": "ResNetFPN", "initial_dim": 8,
                     "block_dims": [8, 12, 16]},
        "coarse": {"d_model": 16, "nhead": 2, "topks": [4, 4, 4],
                   "layer_names": ["self", "cross"]},
        "coarse2": {"d_model": 12, "nhead": 2, "window_size": 3,
                    "attn_window_size": 3,
                    "layer_names": ["cross", "self", "cross"]},
        "fine": {"d_model": 8, "nhead": 2},
        "match_coarse": {"max_matches": 16},
        "match_cascade": {"train_pad_num_gt_min": [16], "max_matches": [32]},
        "train_size": 64,
    }})


def _batch(n, size=64):
    rng = np.random.default_rng(0)
    img0 = rng.random((n, size, size, 3)).astype(np.float32)
    img1 = rng.random((n, size, size, 3)).astype(np.float32)
    depth = rng.random((n, size, size)).astype(np.float32) + 1.0
    K = np.tile(np.asarray([[100.0, 0, size / 2], [0, 100.0, size / 2],
                            [0, 0, 1]], np.float32), (n, 1, 1))
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    return {"image0": jnp.asarray(img0), "image1": jnp.asarray(img1),
            "depth0": jnp.asarray(depth), "depth1": jnp.asarray(depth),
            "K0": jnp.asarray(K), "K1": jnp.asarray(K),
            "T_0to1": jnp.asarray(T), "T_1to0": jnp.asarray(T)}


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the virtual mesh")
def test_sharded_train_step_matches_single_device():
    from casmtr_tpu.parallel.mesh import make_mesh, replicate_state, \
        shard_batch
    from casmtr_tpu.train.train_step import init_train_state, make_train_step

    cfg = _tiny_full_cfg()
    from casmtr_tpu.models.casmtr import CasMTR
    model = CasMTR(cfg.loftr)
    batch = _batch(8)

    state, tx = init_train_state(model, cfg, batch, jax.random.PRNGKey(0),
                                 steps_per_epoch=10, base_lr=1e-3)
    step = jax.jit(make_train_step(model, cfg, tx))

    # single device: whole batch on device 0
    s1, scal1 = step(state, batch)

    # sharded: batch over the 8-device mesh, params replicated
    mesh = make_mesh(8)
    s8, scal8 = step(replicate_state(state, mesh), shard_batch(batch, mesh))

    np.testing.assert_allclose(float(scal1["loss"]), float(scal8["loss"]),
                               rtol=1e-5, atol=1e-6)
    # psum reassociation: partial-sum order differs from the single-device
    # reduction, so the global norm carries a few-1e-4 relative drift
    np.testing.assert_allclose(float(scal1["grad_norm"]),
                               float(scal8["grad_norm"]),
                               rtol=1e-3, atol=1e-6)
    # updated params identical (grad psum == full-batch grad), incl. the
    # global-batch BN statistics
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    # adam normalizes by sqrt(v): where g ~ 0 the psum's fp reassociation is
    # amplified up to the full 1e-3 LR in the update direction.  A systemic
    # psum bug (wrong scaling, missed reduce) shifts ~every element, so pin:
    # the bulk within 5e-5 abs / 1e-4 rel, at most 0.5% of elements in a
    # looser |d| < 2*lr band, none beyond.
    n_loose = n_all = 0
    for a, b in zip(flat1, flat8):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        d = np.abs(a - b)
        ok_tight = d <= 5e-5 + 1e-4 * np.abs(b)
        assert np.all(d < 2e-3), f"param drift beyond 2*lr: {d.max()}"
        n_loose += int((~ok_tight).sum())
        n_all += d.size
    assert n_loose <= max(1, n_all // 200), (n_loose, n_all)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gather_metrics_dedup_last_wins():
    """gather_metrics is identity single-process; aggregate_metrics keeps the
    LAST occurrence of a duplicated pair identifier (reference
    metrics.py:248 dict-overwrite semantics) — so a multi-host gather where a
    pair is re-evaluated later takes the later result."""
    from casmtr_tpu.utils.metrics import aggregate_metrics, gather_metrics

    metrics = {
        "identifiers": ["a#b", "c#d", "a#b"],
        "R_errs": [50.0, 90.0, 0.5],
        "t_errs": [50.0, 90.0, 0.5],
        "epi_errs": [np.asarray([1.0]), np.asarray([1.0]),
                     np.asarray([1e-5])],
        "inliers": [np.asarray([False]), np.asarray([False]),
                    np.asarray([True])],
    }
    same = gather_metrics(metrics)
    assert same["identifiers"] == metrics["identifiers"]
    res = aggregate_metrics(same, epi_err_thr=5e-4)
    # dedup keeps the LAST 'a#b' (0.5deg, epi 1e-5) and 'c#d'
    assert res["auc@5"] > 0.0
    np.testing.assert_allclose(res["prec@5e-04"], 0.5)


def test_train_step_skips_update_on_nonfinite_loss():
    """A non-finite loss must leave params/opt/EMA untouched (the host-side
    NaN dump then captures the last-good state, not poisoned arrays)."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    from casmtr_tpu.config import Config, override
    from casmtr_tpu.models.casmtr import CasMTR
    from casmtr_tpu.train.train_step import init_train_state, make_train_step
    from tests.test_casmtr_model import tiny_casmtr_cfg

    cfg = override(Config(), {"trainer": {"warmup_step": 0, "ema": True}})
    cfg = dataclasses.replace(cfg, loftr=tiny_casmtr_cfg(levels=(4,)))
    model = CasMTR(cfg.loftr)
    rng = np.random.default_rng(0)
    B, s = 1, 64
    K = jnp.asarray([[[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]])
    base = {
        "depth0": jnp.ones((B, s, s), jnp.float32),
        "depth1": jnp.ones((B, s, s), jnp.float32),
        "K0": K, "K1": K,
        "T_0to1": jnp.eye(4)[None], "T_1to0": jnp.eye(4)[None],
    }
    good = dict(base, image0=jnp.asarray(rng.random((B, s, s, 3)), jnp.float32),
                image1=jnp.asarray(rng.random((B, s, s, 3)), jnp.float32))
    bad = dict(base, image0=jnp.full((B, s, s, 3), jnp.nan),
               image1=jnp.full((B, s, s, 3), jnp.nan))

    state, tx = init_train_state(model, cfg, good, jax.random.PRNGKey(0),
                                 10, 1e-3)
    step = jax.jit(make_train_step(model, cfg, tx))

    state1, scalars1 = step(state, good)
    assert np.isfinite(float(scalars1["loss"]))
    p_before = jax.device_get(state1.params)
    state2, scalars2 = step(state1, bad)
    assert not np.isfinite(float(scalars2["loss"]))
    # params (and EMA) unchanged by the skipped step
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        jax.device_get(state2.params), p_before)
    assert int(state2.step) == int(state1.step) + 1
