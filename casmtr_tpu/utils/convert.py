"""PyTorch -> flax checkpoint conversion.

The AUC-parity oracle (SURVEY.md §4) requires loading the reference's released
checkpoints. Flax module names were chosen to mirror the torch module names,
so conversion is a mechanical rename + layout transform:

* ``matcher.`` prefix stripped (reference cascade_model_stage3.py:180-184);
* flax path segments ``foo_0`` <-> torch ``foo.0`` (ModuleList/Sequential);
* Linear  weight [O, I]        -> kernel [I, O];
* Conv2d  weight [O, I, kh, kw]-> kernel [kh, kw, I, O]
  (depthwise [O, 1, kh, kw]    -> [kh, kw, 1, O]);
* Conv2d 1x1 realized as flax Dense -> squeeze + transpose;
* BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats;
* LayerNorm weight -> scale; nn.Embedding weight -> embedding;
* QTAttB merge logits ``py_att.weight`` -> param ``py_att_weight``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

_LEAF_MAP = {
    "kernel": "weight",
    "scale": "weight",
    "bias": "bias",
    "embedding": "weight",
    "mean": "running_mean",
    "var": "running_var",
}

_IDX_RE = re.compile(r"_(\d+)(?=\.|$)")


def _segment_to_torch(seg: str) -> str:
    """'blocks_0_1' -> 'blocks.0.1'; 'dwconv_dwconv' -> 'dwconv.dwconv'."""
    if seg == "dwconv_dwconv":
        return "dwconv.dwconv"
    out = seg
    while True:
        new = _IDX_RE.sub(r".\1", out)
        if new == out:
            return new
        out = new


def flax_path_to_torch_key(path: Tuple[str, ...], leaf: str) -> str:
    """Map a flax param path + leaf name to the torch state_dict key."""
    segs = [_segment_to_torch(p) for p in path]
    if leaf == "py_att_weight":
        segs.append("py_att.weight")
    else:
        segs.append(_LEAF_MAP.get(leaf, leaf))
    return ".".join(segs)


def _transform(value: np.ndarray, flax_shape: Tuple[int, ...],
               leaf: str) -> np.ndarray:
    v = np.asarray(value)
    if leaf == "kernel":
        if v.ndim == 4:
            if len(flax_shape) == 2:      # 1x1 conv realized as Dense
                assert v.shape[2:] == (1, 1), (v.shape, flax_shape)
                v = v[:, :, 0, 0].T
            else:                          # conv OIHW -> HWIO
                v = v.transpose(2, 3, 1, 0)
        elif v.ndim == 2:                  # linear
            v = v.T
    if tuple(v.shape) != tuple(flax_shape):
        raise ValueError(f"shape mismatch after transform: torch {v.shape} "
                         f"vs flax {flax_shape} for leaf '{leaf}'")
    return v


def convert_state_dict(torch_sd: Dict[str, Any], flax_variables: Dict,
                       strict: bool = True):
    """Fill a flax variables dict ({'params': ..., 'batch_stats': ...}) from a
    torch state_dict (tensors or numpy arrays). Returns (variables, report)
    where report lists missing / unused keys."""
    sd = {}
    for k, v in torch_sd.items():
        if k.startswith("matcher."):
            k = k[len("matcher."):]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    used = set()
    missing: List[str] = []

    def build(tree, path):
        if isinstance(tree, dict) and not hasattr(tree, "shape"):
            return {k: build(v, path + (k,)) for k, v in tree.items()}
        leaf = path[-1]
        key = flax_path_to_torch_key(path[:-1], leaf)
        if key in sd:
            used.add(key)
            return _transform(sd[key], tuple(tree.shape), leaf)
        missing.append(key)
        return tree

    new_vars = {}
    for col, tree in flax_variables.items():
        new_vars[col] = build(tree, ())

    unused = sorted(set(sd) - used)
    # num_batches_tracked and truly-optional buffers are expected leftovers
    unused = [k for k in unused if not k.endswith("num_batches_tracked")
              and not k.endswith("relative_position_index")
              and ".window" not in k]
    report = {"missing": missing, "unused": unused}
    if strict and missing:
        raise KeyError(f"missing torch keys for flax params: {missing[:10]}"
                       f"{' ...' if len(missing) > 10 else ''}")
    return new_vars, report


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .ckpt/.pth into numpy arrays (CPU, no grad state)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}
