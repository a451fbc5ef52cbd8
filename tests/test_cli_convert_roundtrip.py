"""End-to-end released-checkpoint recipe (VERDICT r3 #6): a torch-format
.ckpt goes through the standalone converter CLI (cli/convert.py) into an
orbax directory, is loaded by the serving Matcher, and produces EXACTLY the
matches of the same weights used directly — i.e. the one-command
convert -> evaluate path is pinned end-to-end, ready for the released
checkpoints the moment they are reachable.

The torch state dict is synthesized from flax params by inverting the
documented value transforms (utils/convert.py: conv HWIO<->OIHW, dense
transpose), with the released checkpoints' "matcher." prefix.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax

from casmtr_tpu.utils.convert import flax_path_to_torch_key


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
            "fine": {"d_model": 8, "nhead": 2},
            "match_coarse": {"max_matches": 128, "thr": 0.0,
                             "border_rm": 0},
            "match_cascade": {"max_matches": [128]},
        },
    }


def _flax_to_torch_sd(params, prefix="matcher."):
    """Invert utils/convert._transform: build a torch-convention state dict
    whose conversion reproduces ``params`` bit-exactly."""
    sd = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
                continue
            key = prefix + flax_path_to_torch_key(path, k)
            a = np.asarray(v)
            if k == "kernel" and a.ndim == 4:      # HWIO -> OIHW
                a = a.transpose(3, 2, 0, 1)
            elif k == "kernel" and a.ndim == 2:    # [in,out] -> [out,in]
                a = a.T
            sd[key] = torch.from_numpy(np.ascontiguousarray(a))

    walk(params, ())
    return sd


def test_convert_cli_roundtrip_matches(tmp_path):
    from casmtr_tpu.serving import Matcher
    from casmtr_tpu.cli import convert as convert_cli

    ov = _tiny_overrides()
    base = Matcher("outdoor_casmtr_4c", bucket=64, df=32, thr=0.0,
                   overrides=ov)
    sd = _flax_to_torch_sd(jax.device_get(base.variables["params"]))
    sd.update(_flax_to_torch_sd(
        jax.device_get(base.variables.get("batch_stats", {}))))
    ckpt = os.path.join(tmp_path, "released.ckpt")
    torch.save({"state_dict": sd}, ckpt)

    out_dir = os.path.join(tmp_path, "orbax")
    convert_cli.main([ckpt, out_dir, "--model", "outdoor_casmtr_4c",
                      "--overrides-json", json.dumps(ov), "--strict"])

    loaded = Matcher("outdoor_casmtr_4c", bucket=64, df=32, thr=0.0,
                     overrides=ov, ckpt=out_dir)
    # bit-exact round trip of every param leaf
    flat_a = jax.tree_util.tree_leaves_with_path(base.variables["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        loaded.variables["params"]))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]), err_msg=str(path))

    # and identical end-to-end matches on a real pair
    rng = np.random.default_rng(0)
    img0 = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    img1 = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    ra = base.match(img0, img1)
    rb = loaded.match(img0, img1)
    np.testing.assert_array_equal(ra.mkpts0, rb.mkpts0)
    np.testing.assert_array_equal(ra.mkpts1, rb.mkpts1)
    np.testing.assert_allclose(ra.mconf, rb.mconf, rtol=0, atol=0)
