"""Plain QuadTree-LoFTR assembly (the P1 end-to-end slice).

Re-designs reference src/model/quadtree.py:22-100: backbone -> sine PE ->
coarse transformer -> dual-softmax matching -> fine window refinement.
The mutable ``data`` dict becomes a returned MatchOutput pytree; all shapes
are static (fixed-capacity matches).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from casmtr_tpu.config import LoftrConfig
from casmtr_tpu.models.backbone import build_backbone
from casmtr_tpu.models.fine_preprocess import FinePreprocess
from casmtr_tpu.models.transformer import LocalFeatureTransformer
from casmtr_tpu.ops import fine_matching as fm
from casmtr_tpu.ops import matching
from casmtr_tpu.ops.image_ops import resize_nearest
from casmtr_tpu.ops.position_encoding import add_sine_pe_norm
from casmtr_tpu.structs import CoarseStage, FineStage, MatchOutput


def level_mask(mask_full: Optional[jnp.ndarray], h: int, w: int):
    """Downsample a full-resolution padding mask to a level grid, flattened
    (reference cascade_model_stage3.py:60-68 set_stage_mask)."""
    if mask_full is None:
        return None, None
    m = resize_nearest(mask_full[..., None].astype(jnp.float32), h, w)[..., 0]
    return m.reshape(m.shape[0], -1), m  # [B, L], [B, h, w]


class QuadtreeLoFTR(nn.Module):
    """LoFTR with quadtree coarse attention (reference quadtree.py:22-100)."""
    config: LoftrConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False
                 ) -> MatchOutput:
        cfg = self.config
        img0, img1 = batch["image0"], batch["image1"]
        B, H0, W0, _ = img0.shape
        _, H1, W1, _ = img1.shape
        mask0_full = batch.get("mask0")
        mask1_full = batch.get("mask1")
        scale0 = batch.get("scale0")
        scale1 = batch.get("scale1")

        backbone = build_backbone(cfg)
        if (H0, W0) == (H1, W1):
            # concat both images for better BN statistics
            # (reference quadtree.py:59-61)
            feats = backbone(jnp.concatenate([img0, img1], axis=0), train=train)
            feat_c0, feat_c1 = jnp.split(feats[0], 2, axis=0)
            feat_f0, feat_f1 = jnp.split(feats[-1], 2, axis=0)
        else:
            f0s = backbone(img0, train=train)
            f1s = backbone(img1, train=train)
            feat_c0, feat_f0 = f0s[0], f0s[-1]
            feat_c1, feat_f1 = f1s[0], f1s[-1]

        hc0 = feat_c0.shape[1:3]
        hc1 = feat_c1.shape[1:3]
        ts = cfg.train_size
        feat_c0 = add_sine_pe_norm(feat_c0, (ts // 8, ts // 8))
        feat_c1 = add_sine_pe_norm(feat_c1, (ts // 8, ts // 8))

        mask_c0, m0_2d = level_mask(mask0_full, *hc0)
        mask_c1, m1_2d = level_mask(mask1_full, *hc1)

        f0 = feat_c0.reshape(B, -1, feat_c0.shape[-1])
        f1 = feat_c1.reshape(B, -1, feat_c1.shape[-1])
        f0, f1 = LocalFeatureTransformer(
            cfg.coarse, ts // 8, remat=cfg.remat, train_mode=train,
            name="loftr_coarse")(
                f0, f1, hc0, hc1, mask_c0, mask_c1)

        ds = matching.dual_softmax(
            f0, f1, cfg.match_coarse.dsmax_temperature, mask_c0, mask_c1)
        coarse_matches = matching.extract_coarse_matches(
            ds.conf_matrix, cfg.match_coarse.thr, cfg.match_coarse.border_rm,
            hc0, hc1, cfg.match_coarse.max_matches, scale=H0 / hc0[0],
            mask0=m0_2d, mask1=m1_2d, scale0=scale0, scale1=scale1)
        coarse = CoarseStage(
            conf_matrix=ds.conf_matrix, next_idx_c01=ds.next_idx_c01,
            next_idx_c10=ds.next_idx_c10, next_conf_c01=ds.next_conf_c01,
            next_conf_c10=ds.next_conf_c10, matches=coarse_matches,
            hw0=tuple(hc0), hw1=tuple(hc1))

        # fine-level refinement
        W = cfg.fine_window_size
        ff0, ff1 = FinePreprocess(
            cfg.fine.d_model, cfg.coarse.d_model, W,
            cat_c_feat=cfg.fine_concat_coarse_feat, name="fine_preprocess")(
                feat_f0, feat_f1, f0, f1, coarse_matches, hc0, hc1)
        ff0, ff1 = LocalFeatureTransformer(
            cfg.fine, ts // 2, remat=cfg.remat, train_mode=train,
            name="loftr_fine")(
                ff0, ff1, (W, W), (W, W))
        fr = fm.fine_match(ff0, ff1)
        s1 = scale1[coarse_matches.b_ids] if scale1 is not None else None
        mk0, mk1 = fm.fine_keypoints(coarse_matches, fr.coords_norm, W,
                                     scale_f=H0 / feat_f0.shape[1], scale1=s1)
        fine = FineStage(expec_f=fr.expec_f, mkpts0_f=mk0, mkpts1_f=mk1)

        final = coarse_matches.replace(mkpts0=mk0, mkpts1=mk1)
        return MatchOutput(coarse=coarse, cascades={}, fine=fine,
                           final_matches=final, hw0_i=(H0, W0), hw1_i=(H1, W1))
