"""CLI-surface tests for cli/evaluate.py main(): the --thr / --img-size /
--overrides-json overrides must actually reach the config that run_eval
receives (reference test.py:28,36 exposes --test_img_size / --thr)."""

import json

import pytest


def _tiny_model_overrides():
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
        },
        "dataset": {"mgdpt_df": 32},
    }


def test_evaluate_cli_overrides_reach_run_eval(monkeypatch, capsys):
    from casmtr_tpu.cli import evaluate as E

    seen = {}

    def fake_run_eval(cfg, params, dataset=None, max_pairs=None,
                      profiler_name=None, dump_dir=None, pose_solver="cv2"):
        seen["cfg"] = cfg
        seen["max_pairs"] = max_pairs
        return {"auc@5": 0.0}

    monkeypatch.setattr(E, "run_eval", fake_run_eval)
    E.main(["--model", "outdoor_casmtr_4c", "--img-size", "64",
            "--thr", "0.123", "--max-pairs", "3",
            "--overrides-json",
            json.dumps(_tiny_model_overrides())])

    cfg = seen["cfg"]
    assert cfg.loftr.match_coarse.thr == pytest.approx(0.123)
    assert cfg.dataset.mgdpt_img_resize == 64
    assert cfg.loftr.coarse.d_model == 16  # --overrides-json applied
    assert seen["max_pairs"] == 3
    out = capsys.readouterr().out
    assert "auc@5" in out
