"""Training entry point (reference: train.py:72-155 + PLCascadeMatcher loops,
lightning_cascade.py:225-348): config merge, LR scaling, data module with
per-host scene sharding, jitted data-parallel train step, periodic validation
with AUC aggregation, orbax top-k checkpointing, EMA, multi-stage resume."""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from casmtr_tpu.config import Config, dump, override
from casmtr_tpu.configs import build_config
from casmtr_tpu.data.module import MultiSceneDataModule
from casmtr_tpu.models import build_model
from casmtr_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from casmtr_tpu.train.checkpoints import CheckpointManager, load_into_state
from casmtr_tpu.train.optim import (build_lr_schedule, build_optimizer,
                                    new_stage_labels, scaled_lr,
                                    scaled_warmup_step, set_schedule_step)
from casmtr_tpu.train.train_step import TrainState, init_train_state, \
    make_train_step
from casmtr_tpu.utils import metrics as M


def device_batch(batch, mesh=None):
    keys = ("image0", "image1", "depth0", "depth1", "T_0to1", "T_1to0",
            "K0", "K1", "scale0", "scale1", "mask0", "mask1")
    db = {k: jnp.asarray(v) for k, v in batch.items()
          if k in keys and isinstance(v, np.ndarray)}
    if mesh is not None:
        db = shard_batch(db, mesh)
    return db


def make_eval_forward(model):
    """One jitted eval forward, shared across validation epochs — a fresh
    closure per call would retrace (a multi-minute remote compile on the
    relay) every validation."""
    @jax.jit
    def forward(variables, batch):
        out = model.apply(variables, batch, train=False)
        fm = out.final_matches
        return {"b_ids": fm.b_ids, "mkpts0": fm.mkpts0, "mkpts1": fm.mkpts1,
                "mconf": fm.mconf, "valid": fm.valid}

    return forward


# keys the eval forward actually consumes (depth/pose stay host-side)
_VAL_KEYS = ("image0", "image1", "mask0", "mask1", "scale0", "scale1")


def run_validation(cfg: Config, model, variables, val_loader, max_pairs=200,
                   tb=None, step: int = 0, plot_every: int = 32,
                   forward=None):
    """Validation pass; with ``tb`` also logs match figures every
    ``plot_every`` pairs (reference lightning_cascade.py:300-343
    val_match figures + make_matching_figures). Pass ``forward`` (from
    make_eval_forward) to reuse one compiled graph across epochs."""
    from casmtr_tpu.cli.evaluate import evaluate_batch_outputs

    if forward is None:
        forward = make_eval_forward(model)

    metrics = {"identifiers": [], "epi_errs": [], "R_errs": [], "t_errs": [],
               "inliers": []}
    n = 0
    for batch in val_loader:
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k in _VAL_KEYS and isinstance(v, np.ndarray)}
        out = forward(variables, dev)
        out_np = {k: np.asarray(v) for k, v in out.items()}
        evaluate_batch_outputs(out_np, batch, cfg, metrics)
        if tb is not None and (n % plot_every) == 0 and metrics["epi_errs"]:
            from casmtr_tpu.utils.plotting import make_evaluation_figure
            sel = out_np["valid"] & (out_np["b_ids"] == 0)
            fig = make_evaluation_figure(
                np.asarray(batch["image0"][0]).mean(-1),
                np.asarray(batch["image1"][0]).mean(-1),
                out_np["mkpts0"][sel], out_np["mkpts1"][sel],
                metrics["epi_errs"][-batch["K0"].shape[0]],
                cfg.trainer.epi_err_thr)
            tb.figure(f"val_match/pair-{n}", fig, step)
            import matplotlib.pyplot as plt
            plt.close(fig)
        n += batch["K0"].shape[0]
        if n >= max_pairs:
            break
    metrics = M.gather_metrics(metrics)  # multi-host aggregation
    if not metrics["identifiers"]:
        return {}
    return M.aggregate_metrics(metrics, epi_err_thr=cfg.trainer.epi_err_thr)


def resume_state(cfg: Config, state, restored, base_lr: float,
                 steps_per_epoch: int, reset_lr: bool = False,
                 resume_dir: Optional[str] = None, frozen_label_fn=None,
                 global_bs: Optional[int] = None):
    """Stage-aware resume (reference lightning_cascade.py:127-189).

    * params/batch_stats merge non-strictly: modules added by a later stage
      keep their fresh init;
    * new-stage params (absent from the checkpoint) get their own optimizer
      group with a separate warmup starting at the restored step
      (reference :175-181);
    * without --reset-lr, the checkpointed run's LR/schedule config
      (config.json next to the ckpts dir) is kept; with --reset-lr the
      CURRENT config's schedule takes over (reference :127-159);
    * the optimizer inner state is restored when the tree matches exactly
      (same-stage resume), otherwise re-initialized.
    Returns (state, tx).
    """
    tcfg = cfg.trainer
    if not reset_lr and resume_dir:
        old_cfg_path = os.path.join(os.path.dirname(resume_dir.rstrip("/")),
                                    "config.json")
        if os.path.exists(old_cfg_path):
            from casmtr_tpu.config import load as load_cfg
            old = load_cfg(old_cfg_path)
            tcfg = old.trainer
            if global_bs is not None:
                # re-derive from the old config (scaled_lr handles the
                # ScanNet sqrt scaling; a plain ratio would not)
                base_lr = scaled_lr(tcfg, global_bs,
                                    cfg.dataset.trainval_data_source)
            else:
                base_lr = base_lr * (tcfg.canonical_lr
                                     / cfg.trainer.canonical_lr
                                     ) * (cfg.trainer.canonical_bs
                                          / tcfg.canonical_bs)

    params = load_into_state(restored.get("params"), state.params)
    bstats = load_into_state(restored.get("batch_stats"), state.batch_stats)
    rstep = int(np.asarray(restored.get("step", 0)))

    # stage>1 resume: every non-backbone/non-8c group re-warms for
    # warmup_step_stages steps after the restore point (the reference applies
    # this on EVERY stage>1 (re)start, lightning_cascade.py:117,175-181) —
    # not only to checkpoint-absent modules
    labels = (new_stage_labels(params)
              if cfg.loftr.training_stage > 1 else None)
    tx = build_optimizer(tcfg, base_lr, steps_per_epoch,
                         new_param_labels=labels, restore_step=rstep,
                         frozen_label_fn=frozen_label_fn)
    opt_state = tx.init(params)
    if restored.get("opt_state") is not None:
        try:
            from flax import serialization
            opt_state = serialization.from_state_dict(
                opt_state, restored["opt_state"])
        except Exception:
            pass  # structure drift (new stage): keep the fresh state

    opt_state = set_schedule_step(opt_state, rstep)
    # restore the EMA trail when present (it was previously silently reset
    # to the raw params on every resume)
    ema = None
    if cfg.trainer.ema:
        # copy: aliasing params would donate the same buffer twice under jit
        ema = jax.tree_util.tree_map(
            jnp.array,
            load_into_state(restored.get("ema_params"), params)
            if restored.get("ema_params") is not None else params)
    sched = build_lr_schedule(tcfg, base_lr, steps_per_epoch)
    return TrainState(jnp.asarray(rstep, jnp.int32), params, bstats,
                      opt_state, ema), tx, sched


def main(argv=None):
    from casmtr_tpu.cli import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description="CasMTR-TPU training")
    p.add_argument("--model", default="outdoor_casmtr_4c")
    p.add_argument("--data", default="megadepth_trainval_704")
    p.add_argument("--run-dir", default="runs/default")
    p.add_argument("--batch-size", type=int, default=1,
                   help="per-device batch size")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--stage", type=int, default=None,
                   help="training stage override (1=coarse only, 2=+cascade)")
    p.add_argument("--resume", default=None,
                   help="checkpoint dir to resume from (non-strict for new "
                        "stages; reference --resume_from_checkpoint)")
    p.add_argument("--reset-lr", action="store_true")
    p.add_argument("--refine", action="store_true",
                   help="PMT refine: frozen quadtree trunk + ladder + cas_ "
                        "heads (reference train.py:64,108)")
    p.add_argument("--quadtree-ckpt", default=None,
                   help="pretrained quadtree checkpoint for --refine (orbax "
                        "dir or torch .ckpt; reference --quadtree_path)")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--val-every-epochs", type=int, default=1)
    p.add_argument("--max-val-pairs", type=int, default=200)
    p.add_argument("--sanity-val-steps", type=int, default=2,
                   help="val pairs to run before training (PL "
                        "num_sanity_val_steps=2 in every reference script)")
    p.add_argument("--seed", type=int, default=66)
    p.add_argument("--overrides-json", default=None,
                   help="inline JSON config overrides (applied last; the "
                        "reference's trailing `opts` pairs)")
    # multi-process launch (the reference's PL `--num_nodes` DDP entry,
    # train.py:136-148): on Cloud TPU pods pass --dist alone (autodetect);
    # elsewhere pass all three explicit values per process
    p.add_argument("--dist", action="store_true",
                   help="call jax.distributed.initialize() (autodetects on "
                        "TPU pods)")
    p.add_argument("--dist-coordinator", default=None,
                   help="host:port of process 0 (explicit multi-process)")
    p.add_argument("--dist-num-processes", type=int, default=None)
    p.add_argument("--dist-process-id", type=int, default=None)
    args = p.parse_args(argv)

    if args.dist or args.dist_coordinator:
        jax.distributed.initialize(
            coordinator_address=args.dist_coordinator,
            num_processes=args.dist_num_processes,
            process_id=args.dist_process_id)

    overrides = {"trainer": {"seed": args.seed}}
    if args.stage is not None:
        overrides["loftr"] = {"training_stage": args.stage}
    cfg = build_config(args.model, args.data, overrides)
    if args.overrides_json:
        cfg = override(cfg, json.loads(args.overrides_json))

    n_dev = jax.device_count()
    mesh = make_mesh() if n_dev > 1 else None
    global_bs = args.batch_size * n_dev
    base_lr = scaled_lr(cfg.trainer, global_bs,
                        cfg.dataset.trainval_data_source)
    # warmup steps scale inversely with the batch ratio (reference
    # train.py:104); the dumped config carries the SCALED value, like the
    # reference's config dump, so resumes reuse it as-is
    cfg = override(cfg, {"trainer": {"warmup_step": scaled_warmup_step(
        cfg.trainer, global_bs, cfg.dataset.trainval_data_source)}})
    print(f"devices={n_dev} global_bs={global_bs} lr={base_lr:.2e} "
          f"warmup={cfg.trainer.warmup_step}")

    os.makedirs(args.run_dir, exist_ok=True)
    if jax.process_index() == 0:
        dump(cfg, os.path.join(args.run_dir, "config.json"))
    from casmtr_tpu.utils.logging import TensorBoardWriter, get_logger
    tb = TensorBoardWriter(os.path.join(args.run_dir, "tb"))
    log = get_logger()

    dm = MultiSceneDataModule(cfg, world_size=jax.process_count(),
                              rank=jax.process_index())
    # each host loads only its local slice of the global batch; shard_batch
    # assembles the global array from per-process shards
    local_bs = args.batch_size * jax.local_device_count()
    train_loader = dm.train_loader(local_bs, num_workers=args.num_workers)
    val_loader = dm.eval_loader(dm.val_dataset(), batch_size=1,
                                num_workers=args.num_workers)
    steps_per_epoch = max(1, len(train_loader))

    frozen_fn = None
    if args.refine:
        from casmtr_tpu.models.casmtr_refine import frozen_param_label
        frozen_fn = frozen_param_label
    model = build_model(cfg.loftr, refine=args.refine)
    init_b = next(iter(train_loader))
    state, tx = init_train_state(model, cfg, device_batch(init_b),
                                 jax.random.PRNGKey(cfg.trainer.seed),
                                 steps_per_epoch, base_lr,
                                 frozen_label_fn=frozen_fn)
    if args.refine and args.quadtree_ckpt:
        # non-strict trunk load: cas_-prefixed fine heads keep fresh init
        # (reference lightning_cascade_refine.py:32-65,105-109)
        if args.quadtree_ckpt.endswith((".ckpt", ".pth")):
            from casmtr_tpu.utils.convert import (convert_state_dict,
                                                  load_torch_checkpoint)
            sd = load_torch_checkpoint(args.quadtree_ckpt)
            new_vars, report = convert_state_dict(
                sd, {"params": state.params,
                     "batch_stats": state.batch_stats}, strict=False)
            state = state._replace(params=new_vars["params"],
                                   batch_stats=new_vars["batch_stats"])
            print(f"quadtree trunk loaded: {len(report['missing'])} fresh, "
                  f"{len(report['unused'])} unused")
        else:
            restored = CheckpointManager(args.quadtree_ckpt).restore()
            if restored is not None:
                state = state._replace(
                    params=load_into_state(restored.get("params"),
                                           state.params),
                    batch_stats=load_into_state(restored.get("batch_stats"),
                                                state.batch_stats))
    ckpt_mgr = CheckpointManager(os.path.join(args.run_dir, "ckpts"),
                                 metric_name="auc@10")
    # the NaN debug dump gets its own manager: stored alongside the real
    # checkpoints it would be garbage-collected as a low-metric entry
    nan_mgr = None
    lr_sched = build_lr_schedule(cfg.trainer, base_lr, steps_per_epoch)
    if args.resume:
        restored = CheckpointManager(args.resume).restore()
        if restored is not None:
            state, tx, lr_sched = resume_state(
                cfg, state, restored, base_lr, steps_per_epoch,
                reset_lr=args.reset_lr, resume_dir=args.resume,
                frozen_label_fn=frozen_fn, global_bs=global_bs)
            print(f"resumed from {args.resume} at step {int(state.step)}")

    if mesh is not None:
        state = replicate_state(state, mesh)
    step_fn = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))

    val_forward = make_eval_forward(model)  # ONE compile for all val epochs
    if args.sanity_val_steps > 0:
        # catches val-pipeline breakage before paying for a train epoch
        # (reference scripts: --num_sanity_val_steps=2)
        run_validation(cfg, model,
                       {"params": jax.device_get(state.params),
                        "batch_stats": jax.device_get(state.batch_stats)},
                       val_loader, max_pairs=args.sanity_val_steps,
                       forward=val_forward)
        print(f"sanity validation ok ({args.sanity_val_steps} pairs)")

    t0 = time.time()
    for epoch in range(args.epochs):
        # data_s: host time blocked on the input pipeline; step_s: the rest
        # (dispatch + device-blocked fetches). Device execution of step k
        # overlaps the data wait of k+1 (async dispatch), so a loader-bound
        # run shows data_s >> step_s while the chip still runs flat out up
        # to the loader rate — this split is how you tell loader-bound from
        # device-bound without a profiler.
        t_data = 0.0
        t_mark = time.time()
        # Rolling (per-log-window) step wall vs cumulative mean: the cumulative
        # mean includes the first-step compile (minutes through the relay) and
        # overstates step time for hundreds of steps; the windowed mean is the
        # honest warm-step wall (window 0 is the compile step and is labeled).
        win_t0, win_data, win_n = time.time(), 0.0, 0
        for i, batch in enumerate(train_loader):
            dt_data = time.time() - t_mark
            t_data += dt_data
            win_data += dt_data
            state, scalars = step_fn(state, device_batch(batch, mesh))
            win_n += 1
            if i % args.log_every == 0:
                s = {k: float(v) for k, v in scalars.items()}
                now = time.time()
                elapsed = now - t0 + 1e-9
                gstep = int(jax.device_get(state.step))
                s["lr"] = float(lr_sched(gstep))
                tb.scalars({f"train/{k}": v for k, v in s.items()}, gstep)
                win_step = (now - win_t0 - win_data) / win_n
                cum_step = (elapsed - t_data) / (i + 1)
                step_tag = "compile_s" if i == 0 else "step_s"
                rate = win_n / (now - win_t0 + 1e-9)
                print(f"epoch {epoch} step {i}/{steps_per_epoch} "
                      f"loss={s['loss']:.4f} {rate:.2f} it/s "
                      f"data_s={win_data / win_n:.3f} "
                      f"{step_tag}={win_step:.3f} avg_step_s={cum_step:.3f} "
                      + " ".join(
                          f"{k}={v:.2e}" if k == "lr" else f"{k}={v:.3f}"
                          for k, v in s.items() if k != "loss"))
                win_t0, win_data, win_n = time.time(), 0.0, 0
                if not np.isfinite(s["loss"]):
                    # NaN dump (reference lightning_cascade.py:259-265).
                    # The train step SKIPS updates on non-finite loss, so the
                    # dumped params are the last-good (pre-NaN) state.
                    if nan_mgr is None:
                        nan_mgr = CheckpointManager(
                            os.path.join(args.run_dir, "nan_dump"),
                            max_to_keep=1, keep_last=False)
                    nan_mgr.save(int(state.step), jax.device_get(
                        {"params": state.params,
                         "batch_stats": state.batch_stats}))
                    raise RuntimeError(f"NaN loss at step {int(state.step)}")
            t_mark = time.time()
        t0 = time.time()

        if (epoch + 1) % args.val_every_epochs == 0:
            variables = {"params": jax.device_get(state.params),
                         "batch_stats": jax.device_get(state.batch_stats)}
            if cfg.trainer.test_ema and state.ema_params is not None:
                variables["params"] = jax.device_get(state.ema_params)
                # make the selection visible: 'best' checkpoints are ranked
                # by EMA-validation AUC while storing the RAW params
                print("validation uses EMA params (trainer.test_ema=True)")
            results = run_validation(cfg, model, variables, val_loader,
                                     max_pairs=args.max_val_pairs, tb=tb,
                                     step=int(jax.device_get(state.step)),
                                     forward=val_forward)
            tb.scalars({f"val/{k}": float(v) for k, v in results.items()},
                       int(jax.device_get(state.step)))
            tb.flush()
            print(f"epoch {epoch} val: "
                  + json.dumps({k: round(float(v), 4)
                                for k, v in results.items()}))
            ckpt_mgr.save(int(jax.device_get(state.step)),
                          _ckpt_state(state),
                          {k: float(v) for k, v in results.items()})

    # final save: epochs not divisible by --val-every-epochs would otherwise
    # discard the last epochs' training entirely
    final_step = int(jax.device_get(state.step))
    if ckpt_mgr.latest_step() != final_step:
        ckpt_mgr.save(final_step, _ckpt_state(state), {"auc@10": -1.0})
        print(f"final checkpoint saved at step {final_step}")


def _ckpt_state(state):
    d = {"params": state.params, "batch_stats": state.batch_stats,
         "opt_state": state.opt_state, "step": state.step}
    if state.ema_params is not None:
        d["ema_params"] = state.ema_params  # survives resume (test_ema)
    return jax.device_get(d)


if __name__ == "__main__":
    main()
