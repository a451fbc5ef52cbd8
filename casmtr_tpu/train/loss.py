"""CasMTR training loss (reference: src/losses/cascade_loss.py:6-253) with
static shapes: the variable-length boolean-indexed means become mask-weighted
means, and the "assign a wrong gt to avoid DDP deadlock" guards
(cascade_loss.py:34-43,109-114,176-183) disappear — masked means are always
well-defined and XLA has no variable-work deadlock (SURVEY.md §5)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from casmtr_tpu.config import LoftrConfig
from casmtr_tpu.structs import MatchOutput


def _masked_mean(x, sel, w=None):
    """Reference-style mean over selected elements: ``(x*w)[sel].mean()``.

    The optional element weight scales the NUMERATOR only — the reference
    divides by the count of selected elements, weighted or not
    (cascade_loss.py:50-53,94-96: ``loss_pos * weight[pos_mask]`` then
    ``.mean()``) — so padded-out elements still count in the denominator."""
    denom = jnp.maximum(sel.sum(), 1.0)
    xw = x * sel if w is None else x * sel * w
    return xw.sum() / denom


def coarse_loss(conf, conf_gt, loss_cfg, sparse_spvs: bool,
                weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Focal/CE on the dual-softmax conf matrix
    (reference cascade_loss.py:24-98). conf/conf_gt: [B, L0, L1]."""
    pos = conf_gt == 1
    neg = conf_gt == 0
    conf = jnp.clip(conf, 1e-6, 1 - 1e-6)
    if loss_cfg.coarse_type == "cross_entropy":
        lp = -jnp.log(conf)
        ln = -jnp.log(1 - conf)
        return (loss_cfg.pos_weight * _masked_mean(lp, pos, weight)
                + loss_cfg.neg_weight * _masked_mean(ln, neg, weight))
    if loss_cfg.coarse_type == "focal":
        a, g = loss_cfg.focal_alpha, loss_cfg.focal_gamma
        lp = -a * (1 - conf) ** g * jnp.log(conf)
        if sparse_spvs:
            # no dustbin for dual_softmax: positives only (reference :59-87)
            return loss_cfg.pos_weight * _masked_mean(lp, pos, weight)
        ln = -a * conf ** g * jnp.log(1 - conf)
        return (loss_cfg.pos_weight * _masked_mean(lp, pos, weight)
                + loss_cfg.neg_weight * _masked_mean(ln, neg, weight))
    raise ValueError(loss_cfg.coarse_type)


def cascade_loss(window_conf, window_gt, valid, loss_cfg) -> jnp.ndarray:
    """Per-level window-label loss (reference cascade_loss.py:100-135).

    window_conf/window_gt: [M, Kw]; valid: [M] selection mask."""
    conf = jnp.clip(window_conf, 1e-6, 1 - 1e-6)
    pos = (window_gt == 1) & valid[:, None]
    neg = (window_gt == 0) & valid[:, None]
    a, g = loss_cfg.focal_alpha, loss_cfg.focal_gamma
    if loss_cfg.cascade_type == "binary_cross_entropy":
        return (loss_cfg.pos_weight * _masked_mean(-jnp.log(conf), pos)
                + loss_cfg.neg_weight * _masked_mean(-jnp.log(1 - conf), neg))
    if loss_cfg.cascade_type == "cross_entropy":
        return loss_cfg.pos_weight * _masked_mean(-a * jnp.log(conf), pos)
    if loss_cfg.cascade_type == "focal":
        lp = -a * (1 - conf) ** g * jnp.log(conf)
        ln = -a * conf ** g * jnp.log(1 - conf)
        return (loss_cfg.pos_weight * _masked_mean(lp, pos)
                + loss_cfg.neg_weight * _masked_mean(ln, neg))
    raise ValueError(loss_cfg.cascade_type)


def fine_loss(expec_f, expec_f_gt, valid, loss_cfg) -> jnp.ndarray:
    """l2(_with_std) sub-pixel offset loss (reference cascade_loss.py:137-191).

    expec_f: [M, 3]; expec_f_gt: [M, 2]; valid: [M]."""
    # correct-mask on the RAW gt: non-finite rows drop out because NaN/inf
    # comparisons are False (reference :150,168 norm(inf) < thr)
    correct = (jnp.max(jnp.abs(expec_f_gt), axis=1)
               < loss_cfg.fine_correct_thr) & valid
    gt = jnp.where(correct[:, None], jnp.nan_to_num(expec_f_gt), 0.0)
    l2 = ((gt - expec_f[:, :2]) ** 2).sum(-1)
    if loss_cfg.fine_type == "l2":
        return _masked_mean(l2, correct)
    # l2_with_std: inverse-std weights normalized over the REAL rows (the
    # reference's [M] has no padding; our capacity padding must not shift
    # the mean), then detached (reference :170-173)
    std = expec_f[:, 2]
    inv = 1.0 / jnp.clip(std, 1e-10)
    # zero valid rows (a no-gt batch — happens on low-overlap pairs): the
    # normalizer is 0 and w would be inf; the masked-out backward then hits
    # inf*0 = NaN and poisons EVERY upstream gradient (the NaN guard would
    # silently skip the whole step). The reference fabricates one correct
    # row with weight 0 (cascade_loss.py:176-187) — loss 0, finite grads;
    # a unit normalizer reproduces that exactly (correct is empty, so the
    # loss is 0 regardless of w's finite value).
    denom = _masked_mean(inv, valid)
    w = jax.lax.stop_gradient(inv / jnp.where(denom > 0, denom, 1.0))
    return _masked_mean(l2 * w, correct)


def casmtr_loss(out: MatchOutput, gt: Dict, expec_f_gt, cfg: LoftrConfig,
                c_weight: Optional[jnp.ndarray] = None,
                opt_coarse: bool = True) -> Tuple[jnp.ndarray, Dict]:
    """Total loss (reference cascade_loss.py:203-253).

    c_weight: optional [B, L0, L1] padding-mask weight for the coarse term.
    """
    lc = cfg.loss
    scalars = {}
    loss = 0.0
    if opt_coarse:
        l8 = coarse_loss(out.coarse.conf_matrix, gt["conf_matrix_gt_8c"], lc,
                         cfg.match_coarse.sparse_spvs, weight=c_weight)
        l8 = l8 * lc.coarse_weight
        loss = loss + l8
        scalars["loss_8c"] = l8

    for level_key, st in out.cascades.items():
        if st.window_gt_label is None:
            continue
        lcas = cascade_loss(st.window_conf, st.window_gt_label,
                            st.matches.valid, lc) * lc.cascade_weight
        loss = loss + lcas
        scalars[f"loss_{level_key}"] = lcas
        if st.detector_gt_label is not None:
            # detector branch loss (reference cascade_loss.py:234-239)
            ldet = cascade_loss(st.detector_conf, st.detector_gt_label,
                                st.detector_valid, lc) * lc.detector_weight
            loss = loss + ldet
            scalars[f"loss_{level_key}_det"] = ldet

    if out.fine is not None and expec_f_gt is not None:
        last = list(out.cascades.values())[-1] if out.cascades else out.coarse
        lf = fine_loss(out.fine.expec_f, expec_f_gt, last.matches.valid, lc)
        lf = lf * lc.fine_weight
        loss = loss + lf
        scalars["loss_f"] = lf

    scalars["loss"] = loss
    return loss, scalars
