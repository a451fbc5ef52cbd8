"""CasMTR model assemblies (4c and 2c) in flax.

Re-designs reference src/model/cascade_model_stage3.py:25-184 (CasMTR-4c) and
cascade_model_stage4.py:77-213 (CasMTR-2c): backbone pyramid -> 1/8 coarse
transformer + dual-softmax -> UpBlock feature fusion -> cascade transformer +
windowed matching at 1/4 (and 1/2) -> fine sub-pixel refinement. The mutable
``data`` dict becomes a MatchOutput pytree; training-stage gating
(reference :146-178) is static config.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from casmtr_tpu.config import LoftrConfig
from casmtr_tpu.models.backbone import build_backbone
from casmtr_tpu.models.cascade_transformer import CascadeFeatureTransformer
from casmtr_tpu.models.fine_preprocess import FinePreprocess
from casmtr_tpu.models.loftr import level_mask
from casmtr_tpu.models.transformer import LocalFeatureTransformer
from casmtr_tpu.ops import cascade_matching as cm
from casmtr_tpu.ops import fine_matching as fm
from casmtr_tpu.ops import matching
from casmtr_tpu.ops.image_ops import resize_bilinear_align_corners
from casmtr_tpu.ops.nms import d2d_saliency
from casmtr_tpu.ops.position_encoding import add_sine_pe_norm
from casmtr_tpu.structs import (CascadeStage, CoarseStage, FineStage,
                                MatchOutput, Matches)


class UpBlock(nn.Module):
    """2x upsample-and-fuse of the coarser level into the finer one
    (reference cascade_model_stage3.py:25-47)."""
    dim_out: int

    @nn.compact
    def __call__(self, feat_2x, feat_c, train: bool = False):
        """feat_2x: [B', H, W, dim_out] finer backbone feature; feat_c:
        [B', H/2, W/2, dim_in] coarser (post-transformer) feature."""
        up = resize_bilinear_align_corners(feat_c, feat_2x.shape[1],
                                           feat_2x.shape[2])
        inner = nn.Conv(self.dim_out, (1, 1), use_bias=False, name="inner_0")(up)
        inner = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="inner_1")(inner)
        x = feat_2x + inner
        x = nn.Conv(self.dim_out, (3, 3), padding=1, use_bias=False,
                    name="up_0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="up_1")(x)
        return nn.leaky_relu(x, negative_slope=0.01)


def _stage_d2d(stage_cfg, feat_tokens, hw):
    """d2d saliency inputs for a cascade level's test-time post-processing
    (None unless post_config.method == 'd2d'; reference computes S_d2d
    inside CascadeMatching for every level)."""
    if stage_cfg.post_config.method != "d2d":
        return None, None
    c_ = feat_tokens.shape[-1]
    return (d2d_saliency(feat_tokens.astype(jnp.float32) / (c_ ** 0.5), hw),
            hw[1] // 4)


def _detector_labels(stage_cfg, heat, ws, mask, idx_c01, gt_idx, gt_mask,
                     m_cap, hw0, batch, train):
    """Per-level detector branch (reference cascade_matching.py:132-138):
    heatmap from the learnable head, else the max PRE-softmax sim logits
    (NOT the softmax confidence — a (0,1) heatmap makes the detector's own
    softmax near-uniform and gumbel noise swamps it)."""
    if not (train and stage_cfg.detector_mode is not None
            and gt_idx is not None):
        return None, None, None
    if heat is None:
        heat = ws.max_sim_c01.reshape(ws.max_sim_c01.shape[0], *hw0)
    det_matrix = cm.detect_keypoints(
        heat, ws.conf01, stage_cfg.detector_mode, stage_cfg.grid_size or 4,
        rng_key=batch.get("sample_key"))
    return cm.select_detector_labels(det_matrix, mask, idx_c01, gt_idx,
                                     gt_mask, m_cap)


def _cas_cfg(match_cascade, idx: int) -> dict:
    """Per-level view of the list-valued cascade match config
    (reference cascade_model_stage3.py:50-57)."""
    return dict(
        thr=match_cascade.thr[idx],
        pre_thr=match_cascade.pre_thr[idx],
        test_thr=match_cascade.test_thr[idx],
        border_rm=match_cascade.border_rm[idx],
        double_check=match_cascade.double_check[idx],
        temperature=match_cascade.dsmax_temperature[idx],
        train_pad_num_gt_min=match_cascade.train_pad_num_gt_min[idx],
        max_matches=match_cascade.max_matches[idx],
    )


class CasMTR(nn.Module):
    """Cascade matching transformer. cascade_levels=(4,) -> CasMTR-4c;
    (4, 2) -> CasMTR-2c."""
    config: LoftrConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False
                 ) -> MatchOutput:
        cfg = self.config
        stage = cfg.training_stage
        levels = tuple(cfg.cascade_levels)
        img0, img1 = batch["image0"], batch["image1"]
        B, H0, W0, _ = img0.shape
        _, H1, W1, _ = img1.shape
        mask0_full = batch.get("mask0")
        mask1_full = batch.get("mask1")
        scale0 = batch.get("scale0")
        scale1 = batch.get("scale1")
        block_dims = tuple(cfg.backbone.block_dims)
        ts = cfg.train_size

        backbone = build_backbone(cfg)
        if (H0, W0) == (H1, W1):
            feats = backbone(jnp.concatenate([img0, img1], axis=0), train=train)
            f8, f4, ff = feats
            feat_8c0, feat_8c1 = jnp.split(f8, 2, axis=0)
            feat_4c0, feat_4c1 = jnp.split(f4, 2, axis=0)
            feat_f0, feat_f1 = jnp.split(ff, 2, axis=0)
        else:
            a = backbone(img0, train=train)
            b = backbone(img1, train=train)
            feat_8c0, feat_4c0, feat_f0 = a
            feat_8c1, feat_4c1, feat_f1 = b

        hw0_8c, hw1_8c = feat_8c0.shape[1:3], feat_8c1.shape[1:3]
        hw0_4c, hw1_4c = feat_4c0.shape[1:3], feat_4c1.shape[1:3]
        hw0_f, hw1_f = feat_f0.shape[1:3], feat_f1.shape[1:3]

        # ----- 1/8 coarse stage (reference :134-147) -----
        x8_0 = add_sine_pe_norm(feat_8c0, (ts // 8, ts // 8))
        x8_1 = add_sine_pe_norm(feat_8c1, (ts // 8, ts // 8))
        mask_8c0, m8_0 = level_mask(mask0_full, *hw0_8c)
        mask_8c1, m8_1 = level_mask(mask1_full, *hw1_8c)
        t8_0 = x8_0.reshape(B, -1, x8_0.shape[-1])
        t8_1 = x8_1.reshape(B, -1, x8_1.shape[-1])
        t8_0, t8_1 = LocalFeatureTransformer(
            cfg.coarse, ts // 8, remat=cfg.remat, train_mode=train,
            name="loftr_coarse_8c")(
                t8_0, t8_1, hw0_8c, hw1_8c, mask_8c0, mask_8c1)

        # rt/rd test gates of any later cascade stage consume the coarse
        # second-best tracking (off by default: the extra argmax would
        # otherwise change the standard eval graph)
        pcs = [cfg.coarse2.post_config]
        if len(levels) > 1:
            pcs.append(cfg.coarse3.post_config)
        gates_on = (not train) and any(
            p.rt is not None or p.rd is not None for p in pcs)
        ds = matching.dual_softmax(
            t8_0, t8_1, cfg.match_coarse.dsmax_temperature, mask_8c0, mask_8c1,
            track_second=gates_on)
        matches_8c = matching.extract_coarse_matches(
            ds.conf_matrix, cfg.match_coarse.thr, cfg.match_coarse.border_rm,
            hw0_8c, hw1_8c, cfg.match_coarse.max_matches, scale=H0 / hw0_8c[0],
            mask0=m8_0, mask1=m8_1, scale0=scale0, scale1=scale1)
        coarse = CoarseStage(
            conf_matrix=ds.conf_matrix, next_idx_c01=ds.next_idx_c01,
            next_idx_c10=ds.next_idx_c10, next_conf_c01=ds.next_conf_c01,
            next_conf_c10=ds.next_conf_c10, matches=matches_8c,
            hw0=tuple(hw0_8c), hw1=tuple(hw1_8c))

        cascades: Dict[str, CascadeStage] = {}
        final_matches = matches_8c
        fine = None

        if stage >= 2:
            # ----- 1/4 cascade stage (reference :149-169) -----
            x8_0 = t8_0.reshape(B, hw0_8c[0], hw0_8c[1], -1)
            x8_1 = t8_1.reshape(B, hw1_8c[0], hw1_8c[1], -1)
            up1 = UpBlock(block_dims[1], name="up_block1")
            if tuple(hw0_4c) == tuple(hw1_4c):
                # concat both images for better BN statistics
                # (reference cascade_model_stage3.py:36-42)
                fused = up1(jnp.concatenate([feat_4c0, feat_4c1], axis=0),
                            jnp.concatenate([x8_0, x8_1], axis=0), train=train)
                feat_4c0, feat_4c1 = jnp.split(fused, 2, axis=0)
            else:
                feat_4c0 = up1(feat_4c0, x8_0, train=train)
                feat_4c1 = up1(feat_4c1, x8_1, train=train)
            x4_0 = add_sine_pe_norm(feat_4c0, (ts // 4, ts // 4))
            x4_1 = add_sine_pe_norm(feat_4c1, (ts // 4, ts // 4))
            mask_4c0, m4_0 = level_mask(mask0_full, *hw0_4c)
            mask_4c1, m4_1 = level_mask(mask1_full, *hw1_4c)

            t4_0 = x4_0.reshape(B, -1, x4_0.shape[-1])
            t4_1 = x4_1.reshape(B, -1, x4_1.shape[-1])
            cft4 = CascadeFeatureTransformer(cfg.coarse2, ts // 4, remat=cfg.remat,
                                             train_mode=train,
                                             name="loftr_coarse_4c")
            (t4_0, t4_1, idx_4c01, idx_4c10, heat4,
             corners_4c01, corners_4c10) = cft4(
                t4_0, t4_1, ds.next_idx_c01, ds.next_idx_c10,
                hw0_4c, hw1_4c, hw0_8c=hw0_8c, hw1_8c=hw1_8c,
                next_idx_8c01=ds.next_idx_c01, next_idx_8c10=ds.next_idx_c10,
                conf_matrix_8c=ds.conf_matrix, train=train)

            c4 = _cas_cfg(cfg.match_cascade, 0)
            pc4 = cfg.coarse2.post_config
            # ws4's second-best feeds its own rt gate AND (as a pre level)
            # the 2c stage's rt gate
            track4 = (not train) and (
                pc4.rt is not None
                or (len(levels) > 1
                    and cfg.coarse3.post_config.rt is not None))
            ws4 = cm.window_softmax_matching(
                t4_0, t4_1, idx_4c01, idx_4c10, c4["temperature"],
                mask_4c0, mask_4c1, corners0=corners_4c01,
                corners1=corners_4c10, hw0=tuple(hw0_4c), hw1=tuple(hw1_4c),
                prop_window=(cfg.coarse2.window_size
                             if corners_4c01 is not None else 0),
                track_second=track4)
            s_d2d, d2d_w = _stage_d2d(cfg.coarse2, t4_0, hw0_4c)
            if train:
                mask4 = cm.cascade_match_mask_train(
                    ws4, c4["thr"], idx_4c01.shape[-1], hw0_4c, hw1_4c,
                    c4["border_rm"], c4["double_check"], m4_0, m4_1)
            else:
                pc = cfg.coarse2.post_config
                mask4 = cm.cascade_match_mask_test(
                    ws4, hw0_4c, hw1_4c, c4["test_thr"], c4["border_rm"],
                    pre_confs=[ds.next_conf_c01], pre_hws=[tuple(hw0_8c)],
                    pre_thrs=list(c4["pre_thr"]), post_method=pc.method,
                    post_window=pc.window_size, post_topk=pc.topk,
                    post_temperature=pc.temperature,
                    post_stride=pc.stride,
                    double_check=c4["double_check"], mask0_2d=m4_0,
                    mask1_2d=m4_1, s_d2d=s_d2d, d2d_w=d2d_w,
                    rt=pc.rt, rd=pc.rd,
                    pre_confs_s=[ds.next_conf_c01_s],
                    rd_coarse=((ds.next_idx_c01, ds.next_idx_c01_s,
                                tuple(hw0_8c)) if pc.rd is not None else None),
                    image0=(batch["image0"] if pc.method == "sift" else None),
                    image0_mask=(batch.get("mask0") if pc.method == "sift"
                                 else None))
            m_cap4 = (min(c4["train_pad_num_gt_min"], c4["max_matches"])
                      if train else c4["max_matches"])
            matches_4c, extras4 = cm.extract_cascade_matches(
                ws4, mask4, hw0_4c, hw1_4c, m_cap4, scale=H0 / hw0_4c[0],
                scale0=scale0, scale1=scale1,
                priority=batch.get("priority_4c"),
                idx_c01=idx_4c01 if train else None,
                gt_idx_c01=batch.get("gt_idx_4c") if train else None,
                gt_mask_c01=batch.get("gt_mask_4c") if train else None)
            det_gt, det_conf_sel, det_valid = _detector_labels(
                cfg.coarse2, heat4, ws4, mask4, idx_4c01,
                batch.get("gt_idx_4c"), batch.get("gt_mask_4c"), m_cap4,
                hw0_4c, batch, train)
            cascades["4c"] = CascadeStage(
                conf_matrix=ws4.conf01, idx_c01=idx_4c01, idx_c10=idx_4c10,
                next_idx_c01=ws4.next_idx_c01, next_idx_c10=ws4.next_idx_c10,
                next_conf_c01=ws4.next_conf_c01,
                next_conf_c10=ws4.next_conf_c10, matches=matches_4c,
                hw0=tuple(hw0_4c), hw1=tuple(hw1_4c),
                window_gt_label=extras4.get("window_gt_label"),
                window_conf=extras4.get("window_conf"),
                detector_gt_label=det_gt, detector_conf=det_conf_sel,
                detector_valid=det_valid)
            final_matches = matches_4c
            fine_feat0, fine_feat1 = feat_f0, feat_f1
            fine_ctx0, fine_ctx1 = t4_0, t4_1
            fine_hw_c0, fine_hw_c1 = hw0_4c, hw1_4c
            fine_d_model_c = cfg.coarse2.d_model
            fine_level_matches = matches_4c

        if len(levels) > 1 and stage >= 3:
            # ----- 1/2 cascade stage (reference stage4 :178-195) -----
            x4_0 = t4_0.reshape(B, hw0_4c[0], hw0_4c[1], -1)
            x4_1 = t4_1.reshape(B, hw1_4c[0], hw1_4c[1], -1)
            up2 = UpBlock(block_dims[0], name="up_block2")
            if tuple(hw0_f) == tuple(hw1_f):
                fused = up2(jnp.concatenate([feat_f0, feat_f1], axis=0),
                            jnp.concatenate([x4_0, x4_1], axis=0), train=train)
                feat_2c0, feat_2c1 = jnp.split(fused, 2, axis=0)
            else:
                feat_2c0 = up2(feat_f0, x4_0, train=train)
                feat_2c1 = up2(feat_f1, x4_1, train=train)
            x2_0 = add_sine_pe_norm(feat_2c0, (ts // 2, ts // 2))
            x2_1 = add_sine_pe_norm(feat_2c1, (ts // 2, ts // 2))
            mask_2c0, m2_0 = level_mask(mask0_full, *hw0_f)
            mask_2c1, m2_1 = level_mask(mask1_full, *hw1_f)

            t2_0 = x2_0.reshape(B, -1, x2_0.shape[-1])
            t2_1 = x2_1.reshape(B, -1, x2_1.shape[-1])
            cft2 = CascadeFeatureTransformer(cfg.coarse3, ts // 2, remat=cfg.remat,
                                             train_mode=train,
                                             name="loftr_coarse_2c")
            (t2_0, t2_1, idx_2c01, idx_2c10, heat2,
             corners_2c01, corners_2c10) = cft2(
                t2_0, t2_1, ws4.next_idx_c01, ws4.next_idx_c10,
                hw0_f, hw1_f, hw0_8c=hw0_8c, hw1_8c=hw1_8c,
                next_idx_8c01=ds.next_idx_c01, next_idx_8c10=ds.next_idx_c10,
                conf_matrix_8c=ds.conf_matrix, train=train)

            c2 = _cas_cfg(cfg.match_cascade, 1)
            pc2 = cfg.coarse3.post_config
            ws2 = cm.window_softmax_matching(
                t2_0, t2_1, idx_2c01, idx_2c10, c2["temperature"],
                mask_2c0, mask_2c1, corners0=corners_2c01,
                corners1=corners_2c10, hw0=tuple(hw0_f), hw1=tuple(hw1_f),
                prop_window=(cfg.coarse3.window_size
                             if corners_2c01 is not None else 0),
                track_second=(not train) and pc2.rt is not None)
            s_d2d2, d2d_w2 = _stage_d2d(cfg.coarse3, t2_0, tuple(hw0_f))
            if train:
                mask2 = cm.cascade_match_mask_train(
                    ws2, c2["thr"], idx_2c01.shape[-1], hw0_f, hw1_f,
                    c2["border_rm"], c2["double_check"], m2_0, m2_1)
            else:
                pc = cfg.coarse3.post_config
                mask2 = cm.cascade_match_mask_test(
                    ws2, hw0_f, hw1_f, c2["test_thr"], c2["border_rm"],
                    pre_confs=[ds.next_conf_c01, ws4.next_conf_c01],
                    pre_hws=[tuple(hw0_8c), tuple(hw0_4c)],
                    pre_thrs=list(c2["pre_thr"]), post_method=pc.method,
                    post_window=pc.window_size, post_topk=pc.topk,
                    post_temperature=pc.temperature,
                    post_stride=pc.stride,
                    double_check=c2["double_check"], mask0_2d=m2_0,
                    mask1_2d=m2_1, s_d2d=s_d2d2, d2d_w=d2d_w2,
                    rt=pc.rt, rd=pc.rd,
                    pre_confs_s=[ds.next_conf_c01_s, ws4.next_conf_c01_s],
                    rd_coarse=((ds.next_idx_c01, ds.next_idx_c01_s,
                                tuple(hw0_8c)) if pc.rd is not None else None),
                    image0=(batch["image0"] if pc.method == "sift" else None),
                    image0_mask=(batch.get("mask0") if pc.method == "sift"
                                 else None))
            m_cap2 = (min(c2["train_pad_num_gt_min"], c2["max_matches"])
                      if train else c2["max_matches"])
            matches_2c, extras2 = cm.extract_cascade_matches(
                ws2, mask2, hw0_f, hw1_f, m_cap2, scale=H0 / hw0_f[0],
                scale0=scale0, scale1=scale1,
                priority=batch.get("priority_2c"),
                idx_c01=idx_2c01 if train else None,
                gt_idx_c01=batch.get("gt_idx_2c") if train else None,
                gt_mask_c01=batch.get("gt_mask_2c") if train else None)
            det_gt2, det_conf2, det_valid2 = _detector_labels(
                cfg.coarse3, heat2, ws2, mask2, idx_2c01,
                batch.get("gt_idx_2c"), batch.get("gt_mask_2c"), m_cap2,
                tuple(hw0_f), batch, train)
            cascades["2c"] = CascadeStage(
                conf_matrix=ws2.conf01, idx_c01=idx_2c01, idx_c10=idx_2c10,
                next_idx_c01=ws2.next_idx_c01, next_idx_c10=ws2.next_idx_c10,
                next_conf_c01=ws2.next_conf_c01,
                next_conf_c10=ws2.next_conf_c10, matches=matches_2c,
                hw0=tuple(hw0_f), hw1=tuple(hw1_f),
                window_gt_label=extras2.get("window_gt_label"),
                window_conf=extras2.get("window_conf"),
                detector_gt_label=det_gt2, detector_conf=det_conf2,
                detector_valid=det_valid2)
            final_matches = matches_2c
            fine_feat0 = t2_0.reshape(B, hw0_f[0], hw0_f[1], -1)
            fine_feat1 = t2_1.reshape(B, hw1_f[0], hw1_f[1], -1)
            fine_ctx0 = fine_ctx1 = None
            fine_hw_c0, fine_hw_c1 = hw0_f, hw1_f
            fine_d_model_c = cfg.coarse3.d_model
            fine_level_matches = matches_2c

        run_fine = (stage >= 2 and len(levels) == 1) or \
                   (stage >= 3 and len(levels) > 1)
        if run_fine:
            # ----- fine sub-pixel stage (reference :171-178) -----
            Wf = cfg.fine_window_size
            ff0, ff1 = FinePreprocess(
                cfg.fine.d_model, fine_d_model_c, Wf,
                cat_c_feat=cfg.fine_concat_coarse_feat,
                name="fine_preprocess")(
                    fine_feat0, fine_feat1, fine_ctx0, fine_ctx1,
                    fine_level_matches, fine_hw_c0, fine_hw_c1)
            ff0, ff1 = LocalFeatureTransformer(
                cfg.fine, ts // 2, remat=cfg.remat, train_mode=train,
                name="loftr_fine")(
                    ff0, ff1, (Wf, Wf), (Wf, Wf))
            fr = fm.fine_match(ff0, ff1)
            s1 = (scale1[fine_level_matches.b_ids]
                  if scale1 is not None else None)
            mk0, mk1 = fm.fine_keypoints(
                fine_level_matches, fr.coords_norm, Wf,
                scale_f=H0 / hw0_f[0], scale1=s1)
            fine = FineStage(expec_f=fr.expec_f, mkpts0_f=mk0, mkpts1_f=mk1)
            final_matches = fine_level_matches.replace(mkpts0=mk0, mkpts1=mk1)

        return MatchOutput(coarse=coarse, cascades=cascades, fine=fine,
                           final_matches=final_matches,
                           hw0_i=(H0, W0), hw1_i=(H1, W1))
