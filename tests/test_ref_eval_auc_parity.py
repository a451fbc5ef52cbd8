"""Offline dress rehearsal of the released-checkpoint AUC oracle
(VERDICT r4 #3): our `cli/evaluate.run_eval` and the reference's own torch
eval path (test.py:43-77 -> lightning_cascade.py:208-223 ->
src/utils/metrics.py aggregate_metrics:241-261) produce IDENTICAL
AUC@5/10/20 + precision over the same synthetic-geometry pairs with the
same converted weights — pose solver (cv2 RANSAC, seeded), per-pair
R/t errors (inf on failure), epipolar errors, duplicate-identifier dedup
and AUC aggregation all included.  When real checkpoints land, the only
untested variable left is the data itself.

Both sides run a tiny ResNetFPN 4c recipe (the published outdoor recipe's
structure with shrunken dims — full-size parity is pinned by
test_ref_parity.py's full-model tests; this test is about the METRIC
pipeline, which needs ~20 pairs, not a 14M-param backbone).
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax

from casmtr_tpu.utils.convert import convert_state_dict
from tests.ref_stubs import install, reference_config

install()

N_PAIRS = 20
SIZE = 64


def _tiny_ref_config():
    cfg_ref = reference_config(
        "/root/reference/configs/model_configs/outdoor/"
        "loftr_ds_quadtree_cas_twins_large_stage3.py")
    lr = cfg_ref["loftr"]
    lr["backbone_type"] = "ResNetFPN"
    lr["resnetfpn"]["initial_dim"] = 8
    lr["resnetfpn"]["block_dims"] = [8, 12, 16]
    lr["coarse"]["d_model"] = 16
    lr["coarse"]["nhead"] = 2
    lr["coarse"]["topks"] = [4, 4, 4]
    lr["coarse"]["layer_names"] = ["self", "cross"]
    lr["coarse2"]["d_model"] = 12
    lr["coarse2"]["nhead"] = 2
    lr["coarse2"]["window_size"] = 3
    lr["coarse2"]["attn_window_size"] = 3
    lr["coarse2"]["layer_names"] = ["cross", "self", "cross"]
    lr["fine"]["d_model"] = 8
    lr["fine"]["d_ffn"] = 8
    lr["fine"]["nhead"] = 2
    lr["match_coarse"]["thr"] = 0.0
    lr["match_coarse"]["border_rm"] = 0
    lr["match_cascade"]["thr"] = [0.0]
    lr["match_cascade"]["pre_thr"] = [[0.0]]
    lr["match_cascade"]["test_thr"] = [0.0]
    lr["match_cascade"]["border_rm"] = [0]
    return cfg_ref


def _tiny_overrides():
    return {
        "loftr": {
            "backbone": {"backbone_type": "ResNetFPN", "initial_dim": 8,
                         "block_dims": [8, 12, 16]},
            "coarse": {"d_model": 16, "nhead": 2, "topks": [4, 4, 4],
                       "layer_names": ["self", "cross"]},
            "coarse2": {"d_model": 12, "nhead": 2, "window_size": 3,
                        "attn_window_size": 3,
                        "layer_names": ["cross", "self", "cross"]},
            "fine": {"d_model": 8, "d_ffn": 8, "nhead": 2},
            "match_coarse": {"thr": 0.0, "border_rm": 0},
            "match_cascade": {"thr": [0.0], "pre_thr": [[0.0]],
                              "test_thr": [0.0], "border_rm": [0]},
        },
    }


def _synth_pairs(rng):
    """N_PAIRS random-texture pairs with plausible relative poses; pairs 3
    and 4 are exact duplicates (same images AND same pair_names) to
    exercise the identifier dedup in aggregate_metrics."""
    K = np.array([[80.0, 0, SIZE / 2], [0, 80.0, SIZE / 2], [0, 0, 1]],
                 np.float32)
    samples = []
    for n in range(N_PAIRS):
        if n == 4:
            s = dict(samples[3])
            samples.append(s)
            continue
        img0 = rng.random((SIZE, SIZE, 3)).astype(np.float32)
        img1 = rng.random((SIZE, SIZE, 3)).astype(np.float32)
        rvec = rng.normal(0, 0.05, 3)
        th = np.linalg.norm(rvec)
        k = rvec / max(th, 1e-9)
        Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                       [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)
        t = rng.normal(0, 0.3, 3)
        T01 = np.eye(4, dtype=np.float32)
        T01[:3, :3] = R.astype(np.float32)
        T01[:3, 3] = t.astype(np.float32)
        samples.append({
            "image0": img0, "image1": img1,
            "T_0to1": T01, "T_1to0": np.linalg.inv(T01).astype(np.float32),
            "K0": K.copy(), "K1": K.copy(),
            "dataset_name": "MegaDepth", "scene_id": "synth", "pair_id": n,
            "pair_names": (f"a{n}.jpg", f"b{n}.jpg"),
        })
    return samples


def test_ref_eval_auc_parity(rng):
    from casmtr_tpu.configs import build_config
    from casmtr_tpu.models.casmtr import CasMTR
    from casmtr_tpu.cli.evaluate import run_eval

    cfg_ref = _tiny_ref_config()
    torch.manual_seed(0)
    from src.model.cascade_model_stage3 import CasMTR as RefCasMTR
    ref = RefCasMTR(config=cfg_ref["loftr"]).eval()
    from tests.test_ref_parity import _randomize_bn
    _randomize_bn(ref)

    cfg = build_config("outdoor_casmtr_4c", overrides=_tiny_overrides())
    model = CasMTR(cfg.loftr)
    samples = _synth_pairs(rng)
    batch0 = {"image0": np.zeros((1, SIZE, SIZE, 3), np.float32),
              "image1": np.zeros((1, SIZE, SIZE, 3), np.float32)}
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jax.numpy.asarray(v)
                            for k, v in batch0.items()}, train=False)
    from tests.test_ref_parity import _REF_DEAD_PREFIXES
    sd = {k: v for k, v in ref.state_dict().items()
          if not k.startswith(_REF_DEAD_PREFIXES)}
    new_vars, report = convert_state_dict(sd, dict(variables))
    assert not report["missing"] and not report["unused"], report

    # ---- reference side: torch forward + the reference's own metric code
    from src.utils.metrics import (aggregate_metrics,
                                   compute_pose_errors,
                                   compute_symmetrical_epipolar_errors)
    ref_trainer_cfg = types.SimpleNamespace(TRAINER=types.SimpleNamespace(
        RANSAC_PIXEL_THR=cfg.trainer.ransac_pixel_thr,
        RANSAC_CONF=cfg.trainer.ransac_conf))
    cv2.setRNGSeed(0)
    ref_metrics = {"identifiers": [], "epi_errs": [], "R_errs": [],
                   "t_errs": [], "inliers": []}
    for s in samples:
        data = {
            "image0": torch.from_numpy(
                s["image0"].transpose(2, 0, 1)[None].copy()),
            "image1": torch.from_numpy(
                s["image1"].transpose(2, 0, 1)[None].copy()),
            "K0": torch.from_numpy(s["K0"][None].copy()),
            "K1": torch.from_numpy(s["K1"][None].copy()),
            "T_0to1": torch.from_numpy(s["T_0to1"][None].copy()),
            "T_1to0": torch.from_numpy(s["T_1to0"][None].copy()),
            "dataset_name": ["megadepth"], "pair_names": [s["pair_names"]],
        }
        with torch.no_grad():
            ref(data)
        compute_symmetrical_epipolar_errors(data)
        compute_pose_errors(data, ref_trainer_cfg)
        bs = 0
        ref_metrics["identifiers"].append("#".join(s["pair_names"]))
        ref_metrics["epi_errs"].append(
            data["epi_errs"][data["m_bids"] == bs].cpu().numpy())
        ref_metrics["R_errs"].append(data["R_errs"][bs])
        ref_metrics["t_errs"].append(data["t_errs"][bs])
        ref_metrics["inliers"].append(data["inliers"][bs])
    want = aggregate_metrics(ref_metrics, cfg.trainer.epi_err_thr)

    # ---- our side: the actual cli/evaluate path over the same samples
    cv2.setRNGSeed(0)
    got = run_eval(cfg, new_vars, dataset=samples)

    for k5 in (5, 10, 20):
        w = want[f"auc@{k5}"]
        g = got[f"auc@{k5}"]
        np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-9,
                                   err_msg=f"auc@{k5}")
    ref_prec = [v for kk, v in want.items() if kk.startswith("prec@")]
    our_prec = [v for kk, v in got.items() if kk.startswith("prec@")]
    np.testing.assert_allclose(our_prec, ref_prec, rtol=1e-6, atol=1e-9)
    # dedup exercised: 20 pairs, 1 duplicate -> 19 unique on both sides
    assert len(set(ref_metrics["identifiers"])) == N_PAIRS - 1
