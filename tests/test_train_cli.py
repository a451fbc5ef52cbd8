"""End-to-end tests of the training CLI (cli/train.py main()) and the
stage-resume LR machinery (reference train.py:72-155,
lightning_cascade.py:127-189)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")

import jax
import jax.numpy as jnp

from tests.test_data_layer import make_fake_scene


def _tiny_overrides(data_dir, n_samples=8):
    # n_samples_per_subset * 2 scenes must cover one global batch on the
    # 8-device virtual mesh (conftest) with drop_last=True
    return {
        "loftr": {
            "backbone": {"backbone_type": "ResNetFPN", "initial_dim": 8,
                         "block_dims": [8, 12, 16]},
            "coarse": {"d_model": 16, "nhead": 2, "topks": [4, 4, 4],
                       "layer_names": ["self", "cross"]},
            "coarse2": {"d_model": 12, "nhead": 2, "window_size": 3,
                        "attn_window_size": 3,
                        "layer_names": ["cross", "self", "cross"]},
            "fine": {"d_model": 8, "nhead": 2},
            "match_coarse": {"max_matches": 16},
            "match_cascade": {"train_pad_num_gt_min": [16],
                              "max_matches": [32]},
            "train_size": 64,
        },
        "dataset": {
            "trainval_data_source": "MegaDepth",
            "train_data_root": data_dir, "train_npz_root": data_dir,
            "train_list_path": os.path.join(data_dir, "train_list.txt"),
            "val_data_root": data_dir, "val_npz_root": data_dir,
            "val_list_path": os.path.join(data_dir, "val_list.txt"),
            "min_overlap_score_train": 0.0, "min_overlap_score_test": 0.0,
            "mgdpt_img_resize": 64, "mgdpt_df": 32,
        },
        "trainer": {"n_samples_per_subset": n_samples, "warmup_step": 2,
                    "canonical_bs": 1, "canonical_lr": 1e-4},
    }


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scenes")
    make_fake_scene(d, scene_id="0000", n_images=4, n_pairs=4)
    make_fake_scene(d, scene_id="0001", n_images=4, n_pairs=4)
    (d / "train_list.txt").write_text("0000\n0001\n")
    (d / "val_list.txt").write_text("0001\n")
    return str(d)


def test_train_cli_end_to_end_and_stage_resume(scene_dir, tmp_path):
    """main() runs: TB scalars written, validation runs, top-k checkpoint
    saved; a stage-2 resume restores stage-1 params, keeps fresh init for the
    new modules, and continues from the restored step (this is the test that
    would have caught the round-1 dead --reset-lr flag and the
    dict-vs-TrainState resume bug)."""
    from casmtr_tpu.cli.train import main

    run1 = str(tmp_path / "run1")
    args = ["--model", "outdoor_casmtr_4c", "--run-dir", run1,
            "--epochs", "1", "--stage", "1", "--num-workers", "0",
            "--log-every", "1", "--max-val-pairs", "2",
            "--overrides-json", json.dumps(_tiny_overrides(scene_dir))]
    main(args)

    assert os.path.exists(os.path.join(run1, "config.json"))
    tb_files = os.listdir(os.path.join(run1, "tb"))
    assert any("tfevents" in f for f in tb_files), tb_files
    ckpts = os.listdir(os.path.join(run1, "ckpts"))
    assert ckpts, "no checkpoint saved"

    # stage-2 resume into a bigger model
    run2 = str(tmp_path / "run2")
    args2 = ["--model", "outdoor_casmtr_4c", "--run-dir", run2,
             "--epochs", "1", "--stage", "2", "--num-workers", "0",
             "--log-every", "1", "--max-val-pairs", "2",
             "--resume", os.path.join(run1, "ckpts"),
             "--overrides-json", json.dumps(_tiny_overrides(scene_dir))]
    main(args2)
    assert os.listdir(os.path.join(run2, "ckpts"))


def _const_lr_tcfg(**kw):
    from casmtr_tpu.config import TrainerConfig
    import dataclasses
    base = TrainerConfig(scheduler="MultiStepLR", mslr_milestones=(),
                         warmup_step=0, adamw_decay=0.0,
                         gradient_clipping=1e9)
    return dataclasses.replace(base, **kw)


def test_stage_warmup_schedule():
    """New-stage warmup ramps from ratio*base/2 toward base/2 over
    warmup_step_stages, then HOLDS the ramp's final value — the reference
    never restores pg['lr'] after the window (lightning_cascade.py:175-181
    only assigns while inside it), so new-stage groups keep ~base/2 for the
    rest of training."""
    from casmtr_tpu.train.optim import (build_lr_schedule,
                                        stage_warmup_schedule)

    tcfg = _const_lr_tcfg(warmup_step_stages=10, warmup_ratio_stages=0.1)
    base = build_lr_schedule(tcfg, 1e-3, steps_per_epoch=100)
    staged = stage_warmup_schedule(base, tcfg, 1e-3, restore_step=100,
                                   steps_per_epoch=100)
    # before the restore point: base schedule
    np.testing.assert_allclose(float(staged(50)), 1e-3, rtol=1e-6)
    # at the restore point: ratio * base/2
    np.testing.assert_allclose(float(staged(100)), 0.1 * 5e-4, rtol=1e-5)
    # mid-ramp
    np.testing.assert_allclose(float(staged(105)),
                               0.1 * 5e-4 + 0.5 * (5e-4 - 0.1 * 5e-4),
                               rtol=1e-5)
    # after the ramp: the ramp's FINAL value (last assignment at t=9/10),
    # exactly as the never-reset torch pg['lr'] behaves
    end = 0.1 * 5e-4 + 0.9 * (5e-4 - 0.1 * 5e-4)
    np.testing.assert_allclose(float(staged(110)), end, rtol=1e-6)
    np.testing.assert_allclose(float(staged(10000)), end, rtol=1e-6)


def test_new_stage_optimizer_groups():
    """Non-backbone/non-8c params follow the staged warmup while 8c params
    keep the base LR (reference lightning_cascade.py:177 ramps every group
    whose name lacks '8c'/'backbone'; observed through adam update
    magnitudes on constant gradients with zero weight decay)."""
    import optax
    from casmtr_tpu.train.optim import (build_optimizer, new_stage_labels,
                                        set_schedule_step)

    tcfg = _const_lr_tcfg(warmup_step_stages=10, warmup_ratio_stages=0.1)
    params = {"loftr_coarse_8c": {"w": jnp.zeros(3)},
              "loftr_coarse_4c": {"w": jnp.zeros(3)}}
    labels = new_stage_labels(params)
    assert labels == {"loftr_coarse_8c": {"w": "old"},
                      "loftr_coarse_4c": {"w": "new"}}

    base_lr = 1e-3
    tx = build_optimizer(tcfg, base_lr, steps_per_epoch=100,
                         new_param_labels=labels, restore_step=100)
    opt_state = set_schedule_step(tx.init(params), 100)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # adam on constant grads (zero wd): |update| == lr
    old_lr = float(jnp.abs(updates["loftr_coarse_8c"]["w"][0]))
    new_lr = float(jnp.abs(updates["loftr_coarse_4c"]["w"][0]))
    np.testing.assert_allclose(old_lr, base_lr, rtol=1e-4)
    np.testing.assert_allclose(new_lr, 0.1 * base_lr / 2, rtol=1e-4)


def test_set_schedule_step_continues_schedule():
    """After a resume the schedule counter continues from the restored step
    (a fresh optax init would re-enter warmup)."""
    from casmtr_tpu.train.optim import build_optimizer, set_schedule_step

    tcfg = _const_lr_tcfg(warmup_step=100, warmup_ratio=0.0)
    params = {"m": {"w": jnp.zeros(2)}}
    tx = build_optimizer(tcfg, 1e-3, steps_per_epoch=50)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    fresh = tx.init(params)
    up_fresh, _ = tx.update(grads, fresh, params)      # count 0 -> warmup lr
    ff = set_schedule_step(tx.init(params), 500)
    up_ff, _ = tx.update(grads, ff, params)            # count 500 -> post-warmup
    assert float(jnp.abs(up_fresh["m"]["w"][0])) < 1e-6
    # post-warmup level is the LAST warmup value ((warm-1)/warm * base):
    # the reference never restores pg['lr'] (lightning_cascade.py:166-170)
    np.testing.assert_allclose(float(jnp.abs(up_ff["m"]["w"][0])),
                               0.99e-3, rtol=1e-4)


def test_reset_lr_flag_switches_schedule_config(tmp_path):
    """Without --reset-lr a resume keeps the checkpointed run's LR config
    (config.json next to the ckpt dir); with --reset-lr the current config
    wins (reference lightning_cascade.py:127-159)."""
    import dataclasses
    from casmtr_tpu.cli.train import resume_state
    from casmtr_tpu.config import Config, dump
    from casmtr_tpu.train.optim import build_optimizer
    from casmtr_tpu.train.train_step import TrainState

    old_tcfg = _const_lr_tcfg(canonical_lr=4e-3, canonical_bs=1)
    new_tcfg = _const_lr_tcfg(canonical_lr=8e-3, canonical_bs=1)
    run = tmp_path / "old_run"
    (run / "ckpts").mkdir(parents=True)
    dump(dataclasses.replace(Config(), trainer=old_tcfg),
         str(run / "config.json"))

    params = {"m": {"w": jnp.zeros(2)}}
    cfg = dataclasses.replace(Config(), trainer=new_tcfg)
    tx = build_optimizer(new_tcfg, 8e-3, 100)
    state = TrainState(jnp.zeros((), jnp.int32), params, {}, tx.init(params))
    restored = {"params": {"m": {"w": np.ones(2, np.float32)}},
                "step": np.int64(7)}

    def lr_of(state2, tx2):
        grads = jax.tree_util.tree_map(jnp.ones_like, state2.params)
        up, _ = tx2.update(grads, state2.opt_state, state2.params)
        return float(jnp.abs(up["m"]["w"][0]))

    s_keep, tx_keep, sched_keep = resume_state(
        cfg, state, restored, base_lr=8e-3, steps_per_epoch=100,
        reset_lr=False, resume_dir=str(run / "ckpts"))
    s_new, tx_new, sched_new = resume_state(
        cfg, state, restored, base_lr=8e-3, steps_per_epoch=100,
        reset_lr=True, resume_dir=str(run / "ckpts"))
    assert int(s_keep.step) == 7
    np.testing.assert_array_equal(np.asarray(s_keep.params["m"]["w"]),
                                  np.ones(2, np.float32))
    np.testing.assert_allclose(lr_of(s_keep, tx_keep), 4e-3, rtol=1e-4)
    np.testing.assert_allclose(lr_of(s_new, tx_new), 8e-3, rtol=1e-4)


def test_reset_lr_schedule_matches_optimizer(tmp_path):
    """The schedule resume_state returns (used for TB lr logging) reflects
    the config actually driving the optimizer."""
    import dataclasses
    from casmtr_tpu.cli.train import resume_state
    from casmtr_tpu.config import Config, dump
    from casmtr_tpu.train.optim import build_optimizer
    from casmtr_tpu.train.train_step import TrainState

    old_tcfg = _const_lr_tcfg(canonical_lr=4e-3, canonical_bs=1)
    new_tcfg = _const_lr_tcfg(canonical_lr=8e-3, canonical_bs=1)
    run = tmp_path / "old_run"
    (run / "ckpts").mkdir(parents=True)
    dump(dataclasses.replace(Config(), trainer=old_tcfg),
         str(run / "config.json"))
    params = {"m": {"w": jnp.zeros(2)}}
    cfg = dataclasses.replace(Config(), trainer=new_tcfg)
    tx = build_optimizer(new_tcfg, 8e-3, 100)
    state = TrainState(jnp.zeros((), jnp.int32), params, {}, tx.init(params))
    restored = {"params": {"m": {"w": np.ones(2, np.float32)}},
                "step": np.int64(7)}
    _, _, sched = resume_state(cfg, state, restored, base_lr=8e-3,
                               steps_per_epoch=100, reset_lr=False,
                               resume_dir=str(run / "ckpts"))
    np.testing.assert_allclose(float(sched(10)), 4e-3, rtol=1e-5)


def test_refine_resume_keeps_trunk_frozen(tmp_path):
    """A --refine resume must rebuild the optimizer WITH the trunk freeze:
    zero updates (incl. weight decay) for backbone/loftr_coarse params."""
    import dataclasses
    from casmtr_tpu.cli.train import resume_state
    from casmtr_tpu.config import Config
    from casmtr_tpu.models.casmtr_refine import frozen_param_label
    from casmtr_tpu.train.optim import build_optimizer
    from casmtr_tpu.train.train_step import TrainState

    tcfg = _const_lr_tcfg(adamw_decay=0.1)  # decay would corrupt the trunk
    params = {"backbone": {"w": jnp.ones(3)},
              "ladder": {"w": jnp.ones(3)},
              "cas_loftr_fine": {"w": jnp.ones(3)}}
    cfg = dataclasses.replace(Config(), trainer=tcfg)
    tx = build_optimizer(tcfg, 1e-3, 100, frozen_label_fn=frozen_param_label)
    state = TrainState(jnp.zeros((), jnp.int32), params, {}, tx.init(params))
    # earlier-stage checkpoint: trunk + ladder, no cas_ heads -> "new" group
    restored = {"params": {"backbone": {"w": np.full(3, 2.0, np.float32)},
                           "ladder": {"w": np.full(3, 2.0, np.float32)}},
                "step": np.int64(5)}
    state2, tx2, _ = resume_state(cfg, state, restored, base_lr=1e-3,
                                  steps_per_epoch=100, reset_lr=True,
                                  frozen_label_fn=frozen_param_label)
    grads = jax.tree_util.tree_map(jnp.ones_like, state2.params)
    updates, _ = tx2.update(grads, state2.opt_state, state2.params)
    assert float(jnp.abs(updates["backbone"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["ladder"]["w"]).sum()) > 0.0
    assert float(jnp.abs(updates["cas_loftr_fine"]["w"]).sum()) > 0.0


def test_scaled_warmup_step_matches_reference():
    """warmup_step scales INVERSELY with the batch ratio (reference
    train.py:104: WARMUP_STEP = floor(WARMUP_STEP / _scaling))."""
    from casmtr_tpu.train.optim import scaled_warmup_step
    tcfg = _const_lr_tcfg(warmup_step=1875, canonical_bs=64)
    assert scaled_warmup_step(tcfg, 8) == 15000
    assert scaled_warmup_step(tcfg, 64) == 1875
    # ScanNet: sqrt scaling
    assert scaled_warmup_step(tcfg, 16, "ScanNet") == int(1875 / 0.5)


def test_new_stage_labels_name_semantics():
    """Reference rule: ramp everything except '8c' and 'backbone' — at a
    stage-3 resume the restored 4c modules re-warm too."""
    from casmtr_tpu.train.optim import new_stage_labels
    params = {"backbone": {"w": jnp.zeros(1)},
              "loftr_coarse_8c": {"w": jnp.zeros(1)},
              "coarse_matching_8c": {"w": jnp.zeros(1)},
              "loftr_coarse_4c": {"w": jnp.zeros(1)},
              "loftr_fine": {"w": jnp.zeros(1)}}
    labels = new_stage_labels(params)
    assert labels["backbone"]["w"] == "old"
    assert labels["loftr_coarse_8c"]["w"] == "old"
    assert labels["coarse_matching_8c"]["w"] == "old"
    assert labels["loftr_coarse_4c"]["w"] == "new"
    assert labels["loftr_fine"]["w"] == "new"


def test_gradient_clip_is_global_across_groups():
    """PL clips by ONE global norm over every trainable grad before the
    optimizer step (reference train.py:141 gradient_clip_val) — NOT per
    param group. With grads of very different norms in the 'vit' and 'main'
    groups, per-group clipping would rescale them by different factors; this
    pins one AdamW step bit-for-bit against torch's clip_grad_norm_ + AdamW
    (the bug this catches: clip_by_global_norm nested inside
    multi_transform)."""
    torch = pytest.importorskip("torch")
    from casmtr_tpu.train.optim import build_optimizer

    lr, wd, clip, vit_scale = 1e-2, 0.1, 0.5, 0.5
    w_vit = np.array([0.3, -0.2, 0.5], np.float32)
    w_main = np.array([1.0, -0.7], np.float32)
    g_vit = np.array([4.0, -3.0, 2.0], np.float32)   # norm ~5.4
    g_main = np.array([0.02, 0.01], np.float32)      # norm ~0.02

    # torch: global clip then per-group-lr AdamW (reference optimizer build)
    p_vit = torch.nn.Parameter(torch.from_numpy(w_vit.copy()))
    p_main = torch.nn.Parameter(torch.from_numpy(w_main.copy()))
    opt = torch.optim.AdamW(
        [{"params": [p_vit], "lr": lr * vit_scale},
         {"params": [p_main], "lr": lr}], lr=lr, weight_decay=wd)
    p_vit.grad = torch.from_numpy(g_vit.copy())
    p_main.grad = torch.from_numpy(g_main.copy())
    torch.nn.utils.clip_grad_norm_([p_vit, p_main], clip)
    opt.step()

    tcfg = _const_lr_tcfg(adamw_decay=wd, gradient_clipping=clip,
                          vit_lr_scale=vit_scale)
    params = {"backbone": {"vit": {"w": jnp.asarray(w_vit)}},
              "head": {"w": jnp.asarray(w_main)}}
    grads = {"backbone": {"vit": {"w": jnp.asarray(g_vit)}},
             "head": {"w": jnp.asarray(g_main)}}
    tx = build_optimizer(tcfg, lr, steps_per_epoch=100)
    updates, _ = tx.update(grads, tx.init(params), params)
    import optax
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new["backbone"]["vit"]["w"]),
                               p_vit.detach().numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new["head"]["w"]),
                               p_main.detach().numpy(), rtol=1e-6, atol=1e-7)


def test_checkpoint_manager_keeps_latest(tmp_path):
    """A newest checkpoint with a WORSE metric than the top-k must survive
    (PL save_last semantics); orbax best-N alone would delete it."""
    from casmtr_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    for step, auc in [(10, 0.9), (20, 0.8), (30, 0.1)]:
        mgr.save(step, {"params": {"w": np.full(2, float(step))}},
                 {"auc@10": auc})
    assert mgr.latest_step() == 30
    r = CheckpointManager(str(tmp_path / "ck")).restore()
    np.testing.assert_allclose(r["params"]["w"], 30.0)
    # the best checkpoint is still retrievable by step
    r10 = CheckpointManager(str(tmp_path / "ck")).restore(step=10)
    np.testing.assert_allclose(r10["params"]["w"], 10.0)


def test_resume_restores_ema(tmp_path):
    """EMA params in a checkpoint survive the resume instead of being reset
    to the raw params."""
    import dataclasses
    from casmtr_tpu.cli.train import resume_state
    from casmtr_tpu.config import Config
    from casmtr_tpu.train.optim import build_optimizer
    from casmtr_tpu.train.train_step import TrainState

    tcfg = _const_lr_tcfg(ema=True)
    cfg = dataclasses.replace(Config(), trainer=tcfg)
    params = {"m": {"w": jnp.zeros(2)}}
    tx = build_optimizer(tcfg, 1e-3, 100)
    state = TrainState(jnp.zeros((), jnp.int32), params, {}, tx.init(params),
                       ema_params=params)
    restored = {"params": {"m": {"w": np.ones(2, np.float32)}},
                "ema_params": {"m": {"w": np.full(2, 0.5, np.float32)}},
                "step": np.int64(3)}
    s2, _, _ = resume_state(cfg, state, restored, base_lr=1e-3,
                            steps_per_epoch=100, reset_lr=True)
    np.testing.assert_allclose(np.asarray(s2.ema_params["m"]["w"]), 0.5)
    np.testing.assert_allclose(np.asarray(s2.params["m"]["w"]), 1.0)


def test_cli_compile_cache_configured(tmp_path, monkeypatch):
    """Every CLI main enables the persistent XLA compile cache (a 704² train
    graph is a multi-minute/multi-ten-minute compile; without the on-disk
    cache each CLI invocation pays it again — only bench.py configured it
    before). Env override wins; the repo-local .jax_cache is the default in
    a source checkout."""
    from casmtr_tpu.cli import enable_compile_cache
    d = str(tmp_path / "cache")
    monkeypatch.setenv("CASMTR_JAX_CACHE_DIR", d)
    got = enable_compile_cache()
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # all CLI mains call it as their first statement
    import inspect
    for mod in ("train", "evaluate", "match_pair", "reconstruct", "convert"):
        src = inspect.getsource(
            __import__(f"casmtr_tpu.cli.{mod}", fromlist=["main"]).main)
        assert "enable_compile_cache()" in src, mod
