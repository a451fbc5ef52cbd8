"""Integration tests: evaluation pipeline and checkpoint manager over
synthetic scenes with a tiny model."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from casmtr_tpu.config import Config, override
from casmtr_tpu.data.megadepth import MegaDepthDataset
from casmtr_tpu.models import build_model
from tests.test_casmtr_model import tiny_casmtr_cfg
from tests.test_data_layer import make_fake_scene


def test_run_eval_pipeline(tmp_path, rng):
    npz = make_fake_scene(tmp_path, "0005", n_pairs=3, hw=(96, 128))
    lcfg = tiny_casmtr_cfg((4,))
    cfg = Config(loftr=lcfg)
    cfg = override(cfg, {
        "dataset": {"mgdpt_img_resize": 64, "mgdpt_df": 32},
        "trainer": {"epi_err_thr": 1e-4},
    })
    ds = MegaDepthDataset(str(tmp_path), npz, mode="test", is_rgb=True,
                          img_resize=64, df=32, img_padding=True)

    model = build_model(cfg.loftr)
    sample = ds[0]
    init_batch = {"image0": jnp.asarray(sample["image0"][None]),
                  "image1": jnp.asarray(sample["image1"][None])}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)

    from casmtr_tpu.cli.evaluate import run_eval
    results = run_eval(cfg, variables, dataset=ds, max_pairs=3)
    assert "auc@10" in results
    assert "prec@1e-04" in results
    assert 0.0 <= results["auc@10"] <= 1.0


def test_checkpoint_manager_roundtrip(tmp_path):
    from casmtr_tpu.train.checkpoints import CheckpointManager, load_into_state

    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.int32(7)}
    mgr = CheckpointManager(str(tmp_path / "ck"), metric_name="auc@10")
    mgr.save(1, state, {"auc@10": 0.5})
    state2 = {"params": {"w": np.full((2, 3), 9.0, np.float32)},
              "step": np.int32(0)}
    mgr.save(2, state2, {"auc@10": 0.7})

    assert mgr.latest_step() == 2
    assert mgr.best_step() == 2
    restored = mgr.restore(1)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state["params"]["w"])

    # non-strict stage resume: new module keeps fresh init
    bigger = {"params": {"w": np.zeros((2, 3), np.float32),
                         "new_module": {"k": np.ones(4, np.float32)}},
              "step": np.int32(0)}
    merged = load_into_state(restored, bigger)
    np.testing.assert_array_equal(merged["params"]["w"],
                                  state["params"]["w"])
    np.testing.assert_array_equal(merged["params"]["new_module"]["k"],
                                  np.ones(4, np.float32))


def test_plotting_figure(tmp_path, rng):
    from casmtr_tpu.utils.plotting import make_evaluation_figure

    img0 = rng.random((60, 80, 3))
    img1 = rng.random((60, 80, 3))
    mk0 = rng.random((20, 2)) * [80, 60]
    mk1 = rng.random((20, 2)) * [80, 60]
    errs = rng.random(20) * 1e-3
    out = str(tmp_path / "fig.png")
    make_evaluation_figure(img0, img1, mk0, mk1, errs, 5e-4, path=out)
    assert os.path.exists(out)


def test_run_eval_device_pose_solver(tmp_path, rng):
    """--pose-solver device path: the batched on-device RANSAC
    (sfm/pose.py) replaces the per-pair cv2 loop and produces the same
    metric schema end-to-end."""
    npz = make_fake_scene(tmp_path, "0006", n_pairs=2, hw=(96, 128))
    lcfg = tiny_casmtr_cfg((4,))
    cfg = Config(loftr=lcfg)
    cfg = override(cfg, {
        "dataset": {"mgdpt_img_resize": 64, "mgdpt_df": 32},
        "trainer": {"epi_err_thr": 1e-4},
    })
    ds = MegaDepthDataset(str(tmp_path), npz, mode="test", is_rgb=True,
                          img_resize=64, df=32, img_padding=True)
    model = build_model(cfg.loftr)
    sample = ds[0]
    init_batch = {"image0": jnp.asarray(sample["image0"][None]),
                  "image1": jnp.asarray(sample["image1"][None])}
    variables = model.init(jax.random.PRNGKey(0), init_batch, train=False)

    from casmtr_tpu.cli.evaluate import run_eval
    results = run_eval(cfg, variables, dataset=ds, max_pairs=2,
                       pose_solver="device")
    assert "auc@10" in results
    assert 0.0 <= results["auc@10"] <= 1.0
