"""CasMTR PMT-refine model (indoor): frozen pretrained QuadTree trunk +
trainable Ladder side network + new 4c cascade and fine heads.

Re-designs reference src/model/cascade_quadtree_stage3.py:77-199. Freezing is
realized by (a) running the trunk with train=False (no BN updates) under
``stop_gradient`` and (b) excluding ``backbone.``/``loftr_coarse.`` params
from the optimizer (reference lightning_cascade_refine.py:80-99) — see
``frozen_param_label`` below. Fine heads carry the ``cas_`` prefix so the
pretrained checkpoint's old fine weights are not restored into them
(reference :105-109).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from casmtr_tpu.config import LoftrConfig
from casmtr_tpu.models.backbone.resnet_fpn import Ladder_4_2, ResNetFPN_8_4_2
from casmtr_tpu.models.casmtr import (UpBlock, _cas_cfg, _detector_labels,
                                      _stage_d2d)
from casmtr_tpu.models.cascade_transformer import CascadeFeatureTransformer
from casmtr_tpu.models.fine_preprocess import FinePreprocess
from casmtr_tpu.models.loftr import level_mask
from casmtr_tpu.models.transformer import LocalFeatureTransformer
from casmtr_tpu.ops import cascade_matching as cm
from casmtr_tpu.ops import fine_matching as fm
from casmtr_tpu.ops import matching
from casmtr_tpu.ops.position_encoding import add_sine_pe_norm, sine_pe_norm
from casmtr_tpu.structs import (CascadeStage, CoarseStage, FineStage,
                                MatchOutput)

FROZEN_PREFIXES = ("backbone", "loftr_coarse")


def frozen_param_label(path) -> bool:
    """True if a param path belongs to the frozen trunk."""
    head = str(getattr(path[0], "key", path[0])) if path else ""
    return head in FROZEN_PREFIXES


class CasMTRRefine(nn.Module):
    """Frozen quadtree trunk + ladder + 4c cascade (reference
    cascade_quadtree_stage3.py:77-199)."""
    config: LoftrConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False
                 ) -> MatchOutput:
        cfg = self.config
        stage = cfg.training_stage
        img0, img1 = batch["image0"], batch["image1"]
        B, H0, W0, _ = img0.shape
        _, H1, W1, _ = img1.shape
        mask0_full = batch.get("mask0")
        mask1_full = batch.get("mask1")
        scale0 = batch.get("scale0")
        scale1 = batch.get("scale1")
        rd = tuple(cfg.backbone.refine_dims)
        ts = cfg.train_size

        # ----- frozen trunk (train=False: no BN updates; stop_gradient) -----
        backbone = ResNetFPN_8_4_2(
            initial_dim=cfg.backbone.initial_dim,
            block_dims=tuple(cfg.backbone.block_dims),
            is_rgb=False, name="backbone")
        cat = jnp.concatenate([img0, img1], axis=0)
        f8, f4, ff = backbone(cat, train=False)
        f8, f4, ff = map(jax.lax.stop_gradient, (f8, f4, ff))
        feat_8c0, feat_8c1 = jnp.split(f8, 2, axis=0)
        hw0_8c, hw1_8c = feat_8c0.shape[1:3], feat_8c1.shape[1:3]
        hw0_4c = (H0 // 4, W0 // 4)
        hw1_4c = (H1 // 4, W1 // 4)
        hw0_f = (H0 // 2, W0 // 2)

        # ScanNet-fixed PE shape (reference :88)
        x8_0 = feat_8c0 + sine_pe_norm(feat_8c0.shape[-1], *hw0_8c,
                                       max_shape=(480 // 8, 640 // 8))[None]
        x8_1 = feat_8c1 + sine_pe_norm(feat_8c1.shape[-1], *hw1_8c,
                                       max_shape=(480 // 8, 640 // 8))[None]
        mask_8c0, m8_0 = level_mask(mask0_full, *hw0_8c)
        mask_8c1, m8_1 = level_mask(mask1_full, *hw1_8c)
        t8_0 = x8_0.reshape(B, -1, x8_0.shape[-1])
        t8_1 = x8_1.reshape(B, -1, x8_1.shape[-1])
        # the trunk is frozen (stop_gradient below) — no backward ever flows
        # through it, so it keeps the eval dtype policy (bf16 on TPU) even
        # when the refine stages train
        t8_0, t8_1 = LocalFeatureTransformer(
            cfg.coarse, ts // 8, remat=cfg.remat, train_mode=False,
            name="loftr_coarse")(
                t8_0, t8_1, hw0_8c, hw1_8c, mask_8c0, mask_8c1)
        t8_0 = jax.lax.stop_gradient(t8_0)
        t8_1 = jax.lax.stop_gradient(t8_1)

        ds = matching.dual_softmax(
            t8_0, t8_1, cfg.match_coarse.dsmax_temperature, mask_8c0, mask_8c1)
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
            # trainable ladder over concat images, fed frozen trunk features
            if not cfg.backbone.no_lst:
                f4r, ffr = Ladder_4_2(
                    block_dims=tuple(cfg.backbone.block_dims),
                    refine_dims=rd, is_rgb=cfg.is_rgb, bn_fix=cfg.bn_fix,
                    name="ladder")(cat, [f4, ff], train=train)
            else:
                f4r = nn.Dense(rd[1], name="proj4c")(f4)
                ffr = nn.Dense(rd[0], name="projf")(ff)
            feat_4c0, feat_4c1 = jnp.split(f4r, 2, axis=0)
            feat_f0, feat_f1 = jnp.split(ffr, 2, axis=0)

            x8_0 = t8_0.reshape(B, hw0_8c[0], hw0_8c[1], -1)
            x8_1 = t8_1.reshape(B, hw1_8c[0], hw1_8c[1], -1)
            up1 = UpBlock(rd[1], name="up_block1")
            fused = up1(jnp.concatenate([feat_4c0, feat_4c1], axis=0),
                        jnp.concatenate([x8_0, x8_1], axis=0), train=train)
            feat_4c0, feat_4c1 = jnp.split(fused, 2, axis=0)

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
            ws4 = cm.window_softmax_matching(
                t4_0, t4_1, idx_4c01, idx_4c10, c4["temperature"],
                mask_4c0, mask_4c1, corners0=corners_4c01,
                corners1=corners_4c10, hw0=tuple(hw0_4c), hw1=tuple(hw1_4c),
                prop_window=(cfg.coarse2.window_size
                             if corners_4c01 is not None else 0))
            s_d2d, d2d_w = _stage_d2d(cfg.coarse2, t4_0, tuple(hw0_4c))
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
                    mask1_2d=m4_1, s_d2d=s_d2d, d2d_w=d2d_w)
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
                tuple(hw0_4c), batch, train)
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

            Wf = cfg.fine_window_size
            ff0, ff1 = FinePreprocess(
                cfg.fine.d_model, cfg.coarse2.d_model, Wf, cat_c_feat=True,
                name="cas_fine_preprocess")(
                    feat_f0, feat_f1, t4_0, t4_1, matches_4c, hw0_4c, hw1_4c)
            ff0, ff1 = LocalFeatureTransformer(
                cfg.fine, ts // 2, remat=cfg.remat, train_mode=train,
                name="cas_loftr_fine")(
                    ff0, ff1, (Wf, Wf), (Wf, Wf))
            fr = fm.fine_match(ff0, ff1)
            s1 = scale1[matches_4c.b_ids] if scale1 is not None else None
            mk0, mk1 = fm.fine_keypoints(matches_4c, fr.coords_norm, Wf,
                                         scale_f=H0 / hw0_f[0], scale1=s1)
            fine = FineStage(expec_f=fr.expec_f, mkpts0_f=mk0, mkpts1_f=mk1)
            final_matches = matches_4c.replace(mkpts0=mk0, mkpts1=mk1)

        return MatchOutput(coarse=coarse, cascades=cascades, fine=fine,
                           final_matches=final_matches,
                           hw0_i=(H0, W0), hw1_i=(H1, W1))
