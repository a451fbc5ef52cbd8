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


def scaled_lr(tcfg: TrainerConfig, true_batch_size: int,
              data_source: Optional[str] = None) -> float:
    """canonical_lr * true_bs / canonical_bs; sqrt scaling for ScanNet
    (reference train.py:94-104)."""
    ratio = true_batch_size / tcfg.canonical_bs
    if data_source and data_source.lower() == "scannet":
        ratio = math.sqrt(ratio)
    return tcfg.canonical_lr * ratio


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
            epoch = step // steps_per_epoch
            decay = jnp.asarray(1.0, jnp.float32)
            for m in milestones:
                decay = decay * jnp.where(epoch >= m, tcfg.mslr_gamma, 1.0)
            lr = base * decay
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


def build_optimizer(tcfg: TrainerConfig, base_lr: float, steps_per_epoch: int):
    """AdamW with per-group ViT LR scale (reference src/optimizers/:14-24)
    and gradient clipping (reference train gradient_clip_val)."""
    schedule = build_lr_schedule(tcfg, base_lr, steps_per_epoch)
    wd = tcfg.adamw_decay if tcfg.optimizer == "adamw" else tcfg.adam_decay

    def make(scale):
        return optax.chain(
            optax.clip_by_global_norm(tcfg.gradient_clipping),
            optax.scale_by_adam(),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(
                lambda s: schedule(s) * scale),
        )

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "vit" if _is_vit_path(path) else "main", params)

    return optax.multi_transform(
        {"main": make(1.0), "vit": make(tcfg.vit_lr_scale)}, label_fn)


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
