"""Optimizer, LR schedule, and EMA (reference: src/optimizers/__init__.py:5-54,
train.py:94-104 LR scaling, lightning_cascade.py:161-189 warmup and
:269-285 EMA ramp) built on optax."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from casmtr_tpu.config import TrainerConfig


def scaling_ratio(tcfg: TrainerConfig, true_batch_size: int,
                  data_source: Optional[str] = None) -> float:
    """Batch-size scaling factor (reference train.py:97-100): linear in
    true_bs/canonical_bs; sqrt for ScanNet."""
    ratio = true_batch_size / tcfg.canonical_bs
    if data_source and data_source.lower() == "scannet":
        ratio = math.sqrt(ratio)
    return ratio


def scaled_lr(tcfg: TrainerConfig, true_batch_size: int,
              data_source: Optional[str] = None) -> float:
    """canonical_lr * scaling (reference train.py:102)."""
    return tcfg.canonical_lr * scaling_ratio(tcfg, true_batch_size,
                                             data_source)


def scaled_warmup_step(tcfg: TrainerConfig, true_batch_size: int,
                       data_source: Optional[str] = None) -> int:
    """floor(warmup_step / scaling) (reference train.py:104): smaller global
    batches warm up over proportionally MORE steps — the recipes carry the
    canonical (pre-division) values."""
    return math.floor(tcfg.warmup_step
                      / scaling_ratio(tcfg, true_batch_size, data_source))


def build_lr_schedule(tcfg: TrainerConfig, base_lr: float,
                      steps_per_epoch: int):
    """Linear warmup (reference lightning_cascade.py:165-174) then
    MultiStepLR / CosineAnnealing / ExponentialLR (src/optimizers/:42-50)."""
    milestones = tuple(tcfg.mslr_milestones)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = tcfg.warmup_step
        base = jnp.asarray(base_lr, jnp.float32)
        if tcfg.scheduler == "MultiStepLR":
            # EXACT reference semantics (lightning_cascade.py:161-174 +
            # torch MultiStepLR's multiplicative step): the warmup loop only
            # SETS pg['lr'] while step < warmup and never restores
            # initial_lr, so the post-warmup level is the LAST warmup value
            # (((warm-1)/warm)*base for ratio 0); milestone gammas multiply
            # the CURRENT lr, so milestones that fall inside warmup are
            # overwritten by the next warmup assignment and never take
            # effect. ~0.02% from the idealized schedule at the recipes'
            # warmup=4800 but exact for trajectory parity.
            if warm > 0 and tcfg.warmup_type == "linear":
                w0f = tcfg.warmup_ratio * base_lr
                eff_base = w0f + ((warm - 1) / warm) * abs(base_lr - w0f)
            else:
                eff_base = base_lr
            epoch = step // steps_per_epoch
            decay = jnp.asarray(1.0, jnp.float32)
            for m in milestones:
                if m * steps_per_epoch >= warm:   # survives the warmup
                    decay = decay * jnp.where(epoch >= m, tcfg.mslr_gamma,
                                              1.0)
            lr = jnp.asarray(eff_base, jnp.float32) * decay
        elif tcfg.scheduler == "CosineAnnealing":
            epoch = step / steps_per_epoch
            lr = (tcfg.min_lr + (base - tcfg.min_lr) * 0.5
                  * (1 + jnp.cos(jnp.pi * jnp.minimum(epoch, tcfg.cosa_tmax)
                                 / tcfg.cosa_tmax)))
        elif tcfg.scheduler == "ExponentialLR":
            lr = base * tcfg.elr_gamma ** step
        else:
            raise NotImplementedError(tcfg.scheduler)
        if warm > 0 and tcfg.warmup_type == "linear":
            w0 = tcfg.warmup_ratio * base
            warm_lr = w0 + (step / warm) * jnp.abs(base - w0)
            lr = jnp.where(step < warm, warm_lr, lr)
        return lr

    return schedule


def _is_vit_path(path) -> bool:
    return any("vit" in str(getattr(k, "key", k)).lower() for k in path)


def new_stage_labels(params):
    """Per-leaf 'new' / 'old' labels for the stage-resume warmup group.

    The reference ramps EVERY param group whose full name lacks '8c' and
    'backbone' (lightning_cascade.py:177-181) — at a stage-2 resume that is
    exactly the checkpoint-absent modules, but at a stage-3 resume it also
    re-warms the restored 4c/fine modules. Name-based labeling reproduces
    the reference exactly (flax param names mirror the torch names)."""
    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + "/" + k) for k, v in tree.items()}
        low = path.lower()
        return "old" if ("backbone" in low or "8c" in low) else "new"

    return walk(params, "")


def stage_warmup_schedule(schedule, tcfg: TrainerConfig, base_lr: float,
                          restore_step: int, steps_per_epoch: int = 1):
    """Wrap a base LR schedule with the new-stage warmup — EXACT reference
    semantics (lightning_cascade.py:175-181 + torch MultiStepLR's
    multiplicative step): for ``warmup_step_stages`` steps after the restore
    point, the new modules ramp linearly from
    ``warmup_ratio_stages * initial_lr/2`` toward ``initial_lr/2`` (the
    reference halves pg['initial_lr'] — the CONSTANT true lr — for new
    stages). pg['lr'] is never restored afterwards, so the group stays at
    the ramp's final value for the rest of training, with only milestone
    gammas landing at/after the window end applied on top."""
    wss = tcfg.warmup_step_stages
    init = 0.5 * base_lr
    w0 = tcfg.warmup_ratio_stages * init
    milestones = tuple(tcfg.mslr_milestones)

    def staged(step):
        step = jnp.asarray(step, jnp.float32)
        base = schedule(step)
        if wss <= 0:
            return base
        t = (step - restore_step) / wss
        warm = w0 + t * abs(init - w0)
        if tcfg.scheduler == "MultiStepLR":
            end = w0 + ((wss - 1) / wss) * abs(init - w0)
            epoch = step // steps_per_epoch
            decay = jnp.asarray(1.0, jnp.float32)
            for m in milestones:
                if m * steps_per_epoch >= restore_step + wss:
                    decay = decay * jnp.where(epoch >= m, tcfg.mslr_gamma,
                                              1.0)
            after = jnp.asarray(end, jnp.float32) * decay
        else:
            after = base
        out = jnp.where(step < restore_step + wss, warm, after)
        return jnp.where(step < restore_step, base, out)

    return staged


def build_optimizer(tcfg: TrainerConfig, base_lr: float, steps_per_epoch: int,
                    new_param_labels=None, restore_step: int = 0,
                    frozen_label_fn=None):
    """AdamW with per-group ViT LR scale (reference src/optimizers/:14-24)
    and gradient clipping (reference train gradient_clip_val).

    With ``new_param_labels`` (an 'old'/'new' tree from new_stage_labels),
    the NEW params get the separate stage warmup
    (lightning_cascade.py:175-181) starting at ``restore_step``.

    ``frozen_label_fn(path) -> bool`` excludes params from optimization
    entirely (zero updates) — the PMT-refine trunk freeze (reference
    lightning_cascade_refine.py:80-99 skips them in build_optimizer)."""
    schedule = build_lr_schedule(tcfg, base_lr, steps_per_epoch)
    wd = tcfg.adamw_decay if tcfg.optimizer == "adamw" else tcfg.adam_decay

    def make(scale, sched):
        return optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(
                lambda s: sched(s) * scale),
        )

    staged = (stage_warmup_schedule(schedule, tcfg, base_lr, restore_step,
                                    steps_per_epoch)
              if new_param_labels is not None else schedule)

    def label_fn(params):
        def leaf_label(path, _):
            if frozen_label_fn is not None and frozen_label_fn(path):
                return "frozen"
            if _is_vit_path(path):
                return "vit"
            if new_param_labels is not None:
                node = new_param_labels
                for k in path:
                    key = getattr(k, "key", k)
                    if not isinstance(node, dict) or key not in node:
                        return "main"
                    node = node[key]
                if node == "new":
                    return "new"
            return "main"

        return jax.tree_util.tree_map_with_path(leaf_label, params)

    grouped = optax.multi_transform(
        {"main": make(1.0, schedule), "vit": make(tcfg.vit_lr_scale, schedule),
         "new": make(1.0, staged), "frozen": optax.set_to_zero()}, label_fn)
    if not tcfg.gradient_clipping or tcfg.gradient_clipping <= 0:
        return grouped
    # PL clips by ONE global norm across every trainable gradient before the
    # optimizer step (reference train.py:141 gradient_clip_val=0.5), NOT per
    # param group — so the clip must sit OUTSIDE multi_transform. Frozen
    # leaves carry no reference gradient (requires_grad=False params never
    # reach clip_grad_norm_), so they are masked out of the norm.
    clip = optax.clip_by_global_norm(tcfg.gradient_clipping)
    if frozen_label_fn is not None:
        clip = optax.masked(
            clip,
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: not frozen_label_fn(path), params))
    return optax.chain(clip, grouped)


def set_schedule_step(opt_state, step: int):
    """Fast-forward every schedule counter inside an optax state to ``step``.

    optax's ScaleByScheduleState count starts at 0 on ``tx.init``; after a
    checkpoint resume the LR schedule must continue from the restored global
    step (otherwise the run re-enters warmup)."""
    def fix(node):
        if isinstance(node, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(
                count=jnp.asarray(step, jnp.int32))
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(fix(x) for x in node))
        if isinstance(node, (list, tuple)):
            return type(node)(fix(x) for x in node)
        if isinstance(node, dict):
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(opt_state)


def ema_beta_at(step, tcfg: TrainerConfig):
    """EMA decay with linear warmup ramp (reference lightning_cascade.py:271-277)."""
    min_steps = tcfg.steps_range[0]
    warm = tcfg.ema_warmup
    ramp = jnp.clip((step - min_steps) / max(warm, 1), 0.0, 1.0)
    return ramp * tcfg.ema_beta


def ema_update(ema_params, params, beta):
    """p_ema <- p + beta * (p_ema - p) (torch lerp semantics; reference :279-281)."""
    return jax.tree_util.tree_map(
        lambda e, p: p + beta * (e - p), ema_params, params)
