"""The jitted training step: supervision -> forward -> loss -> update.

Replaces the reference's PL `training_step` + custom `optimizer_step`
(reference lightning_cascade.py:191-206,161-189) with a single pure function.
Data parallelism comes from sharding the batch over the mesh's 'data' axis
under jit (GSPMD inserts the gradient psum and computes BatchNorm statistics
over the global batch — stronger than the reference's SyncBN; train.py:140).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from casmtr_tpu.config import Config
from casmtr_tpu.train import supervision as spv
from casmtr_tpu.train.loss import casmtr_loss
from casmtr_tpu.train.optim import build_optimizer, ema_beta_at, ema_update
from casmtr_tpu.models.loftr import level_mask


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def init_train_state(model, cfg: Config, batch, rng, steps_per_epoch: int,
                     base_lr: float, frozen_label_fn=None
                     ) -> Tuple[TrainState, Any]:
    tx = build_optimizer(cfg.trainer, base_lr, steps_per_epoch,
                         frozen_label_fn=frozen_label_fn)

    # ONE jitted init instead of eager flax/optax init: eager init dispatches
    # ~330 single-op jits (truncated_normal/reshape/mul/... per param), each
    # a separate compile RPC — ~minutes of setup through the axon relay's
    # remote-compile tunnel, and each below the persistent-cache write
    # threshold so every process pays it again.  A single graph compiles
    # once and persists.
    def _init(rng, batch):
        variables = model.init(rng, batch, train=False)
        params = variables["params"]
        return params, variables.get("batch_stats", {}), tx.init(params)

    params, batch_stats, opt_state = jax.jit(_init)(rng, batch)
    # EMA must be a COPY: aliasing the params buffers breaks donation
    # (donate_argnums would donate the same buffer twice).  The copy runs as
    # its own jit: outputs of a (non-donating) jit are fresh buffers, so no
    # leaf can alias params — and it is one compile instead of one per leaf.
    ema = (jax.jit(lambda t: jax.tree_util.tree_map(jnp.array, t))(params)
           if cfg.trainer.ema else None)
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats,
                      opt_state, ema), tx


def make_train_step(model, cfg: Config, tx):
    """Returns step_fn(state, batch) -> (state, scalars). jit-able; shard the
    batch over the mesh 'data' axis for multi-chip DP."""
    lcfg = cfg.loftr

    def loss_fn(params, batch_stats, batch, gt):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = model.apply(variables, batch, train=True,
                                   mutable=["batch_stats"])
        expec_gt = None
        if out.fine is not None:
            last = (list(out.cascades.values())[-1] if out.cascades
                    else out.coarse)
            expec_gt = spv.fine_expec_gt(gt, last.matches, batch, lcfg)
        c_weight = None
        if "mask0" in batch:
            h0, w0 = out.coarse.hw0
            h1, w1 = out.coarse.hw1
            m0, _ = level_mask(batch["mask0"], h0, w0)
            m1, _ = level_mask(batch["mask1"], h1, w1)
            c_weight = m0[:, :, None] * m1[:, None, :]
        loss, scalars = casmtr_loss(out, gt, expec_gt, lcfg, c_weight=c_weight)
        # per-level valid match counts (reference lightning_cascade.py:238-240
        # train/valid_n_{level}c TB scalars)
        scalars = dict(scalars)
        for lvl, stage in out.cascades.items():
            scalars[f"valid_n_{lvl}"] = jnp.sum(stage.matches.valid)
        return loss, (mutated.get("batch_stats", batch_stats), scalars)

    # gumbel keypoint detection samples noise per step; the model reads the
    # key from batch['sample_key'] (detect_keypoints asserts it exists)
    needs_sample_key = any(
        getattr(c, "detector_mode", None) == "gumbel"
        for c in (lcfg.coarse2, lcfg.coarse3))

    def step_fn(state: TrainState, batch: Dict):
        gt = spv.compute_supervision(batch, lcfg)
        batch = dict(batch)
        if needs_sample_key:
            batch["sample_key"] = jax.random.fold_in(
                jax.random.PRNGKey(cfg.trainer.seed), state.step)
        if lcfg.cascade:
            for level in lcfg.cascade_levels:
                batch[f"gt_idx_{level}c"] = gt[f"gt_idx_{level}c"]
                batch[f"gt_mask_{level}c"] = gt[f"gt_mask_{level}c"]
        (loss, (new_bs, scalars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, gt)
        # non-finite loss: skip the whole update (params/opt/EMA/BN keep the
        # last-good state) so the host-side NaN dump captures pre-divergence
        # params instead of already-poisoned ones (the reference dumps
        # pre-optimizer-step state, lightning_cascade.py:259-265)
        gnorm = optax.global_norm(grads)
        good = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(good, g, jnp.zeros_like(g)), grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(good, a, b), new, old)
        new_params = keep(new_params, state.params)
        new_opt = keep(new_opt, state.opt_state)
        new_bs = keep(new_bs, state.batch_stats)
        new_ema = state.ema_params
        if new_ema is not None:
            beta = ema_beta_at(state.step, cfg.trainer)
            new_ema = keep(ema_update(new_ema, new_params, beta), new_ema)
        scalars = dict(scalars)
        scalars["grad_norm"] = gnorm
        return TrainState(state.step + 1, new_params, new_bs, new_opt,
                          new_ema), scalars

    return step_fn
