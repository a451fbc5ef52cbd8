"""Checkpoint loading across CLIs: orbax train checkpoints (which carry
params/batch_stats/opt_state/step) must load into eval-style variables —
including batch_stats (fresh-init BN statistics would silently corrupt
eval) — and the standalone convert CLI must produce a loadable bundle."""

import os

import numpy as np
import pytest


def test_load_checkpoint_variables_from_train_checkpoint(tmp_path):
    from casmtr_tpu.train.checkpoints import (CheckpointManager,
                                              load_checkpoint_variables)

    saved = {
        "params": {"w": np.full(3, 7.0)},
        "batch_stats": {"bn": {"mean": np.full(2, 3.0)}},
        "opt_state": {"v": np.ones(1)},
        "step": np.int32(5),
    }
    CheckpointManager(str(tmp_path / "ck")).save(0, saved)

    fresh = {
        "params": {"w": np.zeros(3)},
        "batch_stats": {"bn": {"mean": np.zeros(2)}},
    }
    out = load_checkpoint_variables(str(tmp_path / "ck"), fresh)
    np.testing.assert_allclose(out["params"]["w"], 7.0)
    np.testing.assert_allclose(out["batch_stats"]["bn"]["mean"], 3.0)

    # new-stage modules absent from the checkpoint keep their fresh init
    fresh2 = {
        "params": {"w": np.zeros(3), "new_module": {"k": np.full(4, 9.0)}},
        "batch_stats": {"bn": {"mean": np.zeros(2)}},
    }
    out2 = load_checkpoint_variables(str(tmp_path / "ck"), fresh2)
    np.testing.assert_allclose(out2["params"]["w"], 7.0)
    np.testing.assert_allclose(out2["params"]["new_module"]["k"], 9.0)

    with pytest.raises(FileNotFoundError):
        load_checkpoint_variables(str(tmp_path / "empty"), fresh)


def test_convert_cli_writes_loadable_bundle(tmp_path):
    torch = pytest.importorskip("torch")

    from casmtr_tpu.cli.convert import main

    # an (intentionally) empty torch checkpoint: conversion reports all
    # target keys missing but the plumbing writes a loadable orbax bundle
    ckpt = str(tmp_path / "w.ckpt")
    torch.save({"state_dict": {}}, ckpt)
    out = str(tmp_path / "bundle")
    tiny = ('{"loftr": {"backbone": {"backbone_type": "ResNetFPN", '
            '"initial_dim": 8, "block_dims": [8, 12, 16]}, '
            '"coarse": {"d_model": 16, "nhead": 2, "topks": [4, 4, 4], '
            '"layer_names": ["self", "cross"]}, '
            '"coarse2": {"d_model": 12, "nhead": 2, "window_size": 3, '
            '"attn_window_size": 3, '
            '"layer_names": ["cross", "self", "cross"]}, '
            '"fine": {"d_model": 8, "nhead": 2}, '
            '"match_coarse": {"max_matches": 16}, '
            '"match_cascade": {"train_pad_num_gt_min": [16], '
            '"max_matches": [32]}}, "dataset": {"mgdpt_df": 32}}')
    main([ckpt, out, "--model", "outdoor_casmtr_4c",
          "--overrides-json", tiny])
    assert os.path.exists(os.path.join(out, "config.json"))

    from casmtr_tpu.train.checkpoints import load_checkpoint_variables
    import jax
    import jax.numpy as jnp
    from casmtr_tpu.configs import build_config
    from casmtr_tpu.models import build_model
    import json as J
    cfg = build_config("outdoor_casmtr_4c", overrides=J.loads(tiny))
    model = build_model(cfg.loftr)
    b = {"image0": jnp.zeros((1, 64, 64, 3)),
         "image1": jnp.zeros((1, 64, 64, 3))}
    variables = model.init(jax.random.PRNGKey(0), b, train=False)
    loaded = load_checkpoint_variables(out, dict(variables))
    assert set(loaded["params"].keys()) == set(variables["params"].keys())
