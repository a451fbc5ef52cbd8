"""Immutable pytree structures that replace the reference's mutable ``data``
dict batch object (reference: cascade_model_stage3.py:115-132 updates a dict in
place; here every stage returns typed state).

All shapes are static: the variable-length match lists that the reference
builds with ``torch.where`` (coarse_matching.py:129-132) become fixed-capacity
buffers with validity masks (SURVEY.md §7 delta 2).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Matches:
    """A fixed-capacity set of matches (capacity M = config max_matches).

    Invalid slots have valid=False and are ignored by all consumers.
    """
    b_ids: jnp.ndarray       # [M] int32 batch index
    i_ids: jnp.ndarray       # [M] int32 flat position in image0 grid
    j_ids: jnp.ndarray       # [M] int32 flat position in image1 grid
    mconf: jnp.ndarray       # [M] f32 confidence
    valid: jnp.ndarray       # [M] bool
    mkpts0: jnp.ndarray      # [M, 2] f32 (x, y) in original image0 pixels
    mkpts1: jnp.ndarray      # [M, 2] f32 (x, y) in original image1 pixels


@struct.dataclass
class CoarseStage:
    """Output of the 1/8 dual-softmax stage (reference coarse_matching.py:79-89)."""
    conf_matrix: jnp.ndarray     # [B, L0, L1] dual-softmax confidences
    next_idx_c01: jnp.ndarray    # [B, L0] int32 argmax over image1
    next_idx_c10: jnp.ndarray    # [B, L1] int32 argmax over image0
    next_conf_c01: jnp.ndarray   # [B, L0]
    next_conf_c10: jnp.ndarray   # [B, L1]
    matches: Matches
    hw0: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))
    hw1: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))


@struct.dataclass
class CascadeStage:
    """Output of a cascade matching level (reference cascade_matching.py:155-168)."""
    conf_matrix: jnp.ndarray     # [B, L0, Kw] window softmax confidences
    idx_c01: jnp.ndarray         # [B, L0, Kw] int32 candidate indices
    idx_c10: jnp.ndarray         # [B, L1, Kw]
    next_idx_c01: jnp.ndarray    # [B, L0] int32
    next_idx_c10: jnp.ndarray    # [B, L1] int32
    next_conf_c01: jnp.ndarray   # [B, L0]
    next_conf_c10: jnp.ndarray   # [B, L1]
    matches: Matches
    hw0: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))
    hw1: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))
    # training-only: window ground-truth labels gathered for the selected set
    window_gt_label: Optional[jnp.ndarray] = None   # [M, Kw]
    window_conf: Optional[jnp.ndarray] = None       # [M, Kw]
    # training-only, detector branch (reference cascade_matching.py:288-314)
    detector_gt_label: Optional[jnp.ndarray] = None   # [M, Kw]
    detector_conf: Optional[jnp.ndarray] = None       # [M, Kw]
    detector_valid: Optional[jnp.ndarray] = None      # [M]


@struct.dataclass
class FineStage:
    """Sub-pixel refinement output (reference fine_matching.py:107-137)."""
    expec_f: jnp.ndarray     # [M, 3] normalized (x, y) offset + std
    mkpts0_f: jnp.ndarray    # [M, 2]
    mkpts1_f: jnp.ndarray    # [M, 2]


@struct.dataclass
class MatchOutput:
    """Full forward output of a CasMTR/LoFTR model."""
    coarse: CoarseStage
    cascades: Dict[str, CascadeStage]
    fine: Optional[FineStage]
    final_matches: Matches       # the match set fed to pose estimation
    hw0_i: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))
    hw1_i: Tuple[int, int] = struct.field(pytree_node=False, default=(0, 0))
