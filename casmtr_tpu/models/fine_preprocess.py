"""Fine-level window preprocessing module (parameters for the optional
coarse-context concat path).

reference: src/model/functions/fine_matching.py:14-67 (CascadeFinePreprocess)
and :140-192 (FinePreprocess) — identical math, different config plumbing.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from casmtr_tpu.ops.fine_matching import extract_windows
from casmtr_tpu.structs import Matches


class FinePreprocess(nn.Module):
    """Gathers W x W windows at the fine level around each match and optionally
    fuses down-projected coarse features (reference fine_matching.py:48-65)."""
    d_model_f: int
    d_model_c: int
    window_size: int
    cat_c_feat: bool = True

    @nn.compact
    def __call__(self, feat_f0, feat_f1, feat_c0, feat_c1, matches: Matches,
                 hw0_c: Tuple[int, int], hw1_c: Tuple[int, int]):
        """feat_f*: [B, Hf, Wf, Cf] fine maps; feat_c*: [B, Lc, Cc] coarse
        tokens; returns ([M, W*W, Cf], [M, W*W, Cf])."""
        W = self.window_size
        stride = feat_f0.shape[1] // hw0_c[0]
        f0 = extract_windows(feat_f0, matches.b_ids, matches.i_ids, hw0_c,
                             stride, W)
        f1 = extract_windows(feat_f1, matches.b_ids, matches.j_ids, hw1_c,
                             stride, W)
        if self.cat_c_feat:
            c0 = feat_c0[matches.b_ids, matches.i_ids]  # [M, Cc]
            c1 = feat_c1[matches.b_ids, matches.j_ids]
            cat = jnp.concatenate([c0, c1], axis=0)     # [2M, Cc]
            cat = nn.Dense(self.d_model_f, name="down_proj")(cat)
            both = jnp.concatenate([f0, f1], axis=0)    # [2M, WW, Cf]
            cat = jnp.broadcast_to(cat[:, None], both.shape[:2] + cat.shape[-1:])
            merged = nn.Dense(self.d_model_f, name="merge_feat")(
                jnp.concatenate([both, cat], axis=-1))
            f0, f1 = jnp.split(merged, 2, axis=0)
        return f0, f1
