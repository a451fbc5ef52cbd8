"""Benchmark evaluation (reference: test.py:43-77 + PLCascadeMatcher
test_step/test_epoch_end, lightning_cascade.py:350-404): run the matcher over
a test split, estimate poses on host, aggregate AUC@5/10/20 + epipolar
precision.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from casmtr_tpu.config import Config, dump
from casmtr_tpu.configs import build_config
from casmtr_tpu.data.module import MultiSceneDataModule
from casmtr_tpu.models import build_model
from casmtr_tpu.utils import metrics as M
from casmtr_tpu.utils.profiler import build_profiler


def evaluate_batch_outputs(out_np: Dict, batch: Dict, cfg: Config,
                           metrics: Dict):
    """Host-side per-batch metric computation (reference
    lightning_cascade.py:208-223). out_np holds numpy final-match arrays."""
    B = batch["K0"].shape[0]
    b_ids = out_np["b_ids"]
    valid = out_np["valid"]
    for b in range(B):
        sel = valid & (b_ids == b)
        mk0 = out_np["mkpts0"][sel]
        mk1 = out_np["mkpts1"][sel]
        T = batch["T_0to1"][b]
        K0, K1 = batch["K0"][b], batch["K1"][b]
        epi = M.compute_epipolar_errors(mk0, mk1, T, K0, K1)
        R_err, t_err, inl = M.compute_pose_errors(
            mk0, mk1, T, K0, K1, pixel_thr=cfg.trainer.ransac_pixel_thr,
            conf=cfg.trainer.ransac_conf)
        # fallback id must be unique across the run AND across hosts (the
        # multi-host gather_metrics dedup would otherwise collapse distinct
        # pairs evaluated on different processes)
        metrics["identifiers"].append(
            "#".join(batch["pair_names"][b]) if "pair_names" in batch
            else f"r{jax.process_index()}pair{len(metrics['identifiers'])}")
        metrics["epi_errs"].append(epi)
        metrics["R_errs"].append(R_err)
        metrics["t_errs"].append(t_err)
        metrics["inliers"].append(inl)


def _device_pose_metrics(out_np: Dict, batch: Dict, cfg: Config,
                         metrics: Dict, pose_jit):
    """Batched on-device essential-matrix RANSAC (sfm/pose.py) replacing the
    per-pair host cv2 loop of evaluate_batch_outputs; epipolar errors stay
    host-side numpy (cheap). The fixed-capacity match buffer goes to the
    solver whole, one row-mask per pair — a single jit shape for the run."""
    B = batch["K0"].shape[0]
    b_ids, valid = out_np["b_ids"], out_np["valid"]
    sel_b = valid[None, :] & (b_ids[None, :] == np.arange(B)[:, None])
    Mtot = valid.shape[0]
    k0 = np.broadcast_to(out_np["mkpts0"], (B, Mtot, 2))
    k1 = np.broadcast_to(out_np["mkpts1"], (B, Mtot, 2))
    res = pose_jit(jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(sel_b),
                   jnp.asarray(batch["K0"]), jnp.asarray(batch["K1"]))
    ok = np.asarray(res.ok)
    Rs, ts, inl = np.asarray(res.R), np.asarray(res.t), np.asarray(res.inliers)
    for b in range(B):
        sel = sel_b[b]
        epi = M.compute_epipolar_errors(
            out_np["mkpts0"][sel], out_np["mkpts1"][sel],
            batch["T_0to1"][b], batch["K0"][b], batch["K1"][b])
        if ok[b]:
            t_err, r_err = M.relative_pose_error(
                batch["T_0to1"][b], Rs[b], ts[b])
        else:
            t_err = r_err = np.inf
        metrics["identifiers"].append(
            "#".join(batch["pair_names"][b]) if "pair_names" in batch
            else f"r{jax.process_index()}pair{len(metrics['identifiers'])}")
        metrics["epi_errs"].append(epi)
        metrics["R_errs"].append(r_err)
        metrics["t_errs"].append(t_err)
        metrics["inliers"].append(inl[b][sel])


def run_eval(cfg: Config, params, dataset=None, max_pairs: Optional[int] = None,
             profiler_name: Optional[str] = None,
             dump_dir: Optional[str] = None,
             pose_solver: str = "cv2") -> Dict:
    model = build_model(cfg.loftr)
    profiler = build_profiler(profiler_name)
    pose_jit = None
    if pose_solver == "device":
        from functools import partial
        from casmtr_tpu.sfm.pose import estimate_pose_batch
        pose_jit = jax.jit(partial(estimate_pose_batch,
                                   thr_px=cfg.trainer.ransac_pixel_thr))
    elif pose_solver != "cv2":
        raise ValueError(f"unknown pose solver: {pose_solver!r}")

    @jax.jit
    def forward(variables, batch):
        out = model.apply(variables, batch, train=False)
        fm = out.final_matches
        return {"b_ids": fm.b_ids, "mkpts0": fm.mkpts0, "mkpts1": fm.mkpts1,
                "mconf": fm.mconf, "valid": fm.valid}

    if dataset is None:
        dm = MultiSceneDataModule(cfg)
        dataset = dm.test_dataset()
    from casmtr_tpu.data.loader import DataLoader
    loader = DataLoader(dataset, None, batch_size=1, num_workers=4,
                        drop_last=False)

    metrics = {"identifiers": [], "epi_errs": [], "R_errs": [], "t_errs": [],
               "inliers": []}
    n = 0
    dumps = []
    for batch in loader:
        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if isinstance(v, np.ndarray) and k in
                     ("image0", "image1", "mask0", "mask1", "scale0",
                      "scale1")}
        with profiler.profile("Model Matching"):
            out = forward(params, dev_batch)
            out_np = {k: np.asarray(v) for k, v in out.items()}
        with profiler.profile("RANSAC"):
            if pose_jit is not None:
                _device_pose_metrics(out_np, batch, cfg, metrics, pose_jit)
            else:
                evaluate_batch_outputs(out_np, batch, cfg, metrics)
        if dump_dir is not None:
            dumps.append({k: out_np[k] for k in out_np})
        n += batch["K0"].shape[0]
        if max_pairs is not None and n >= max_pairs:
            break

    # multi-host: concatenate every process's pairs before aggregation
    # (reference lightning_cascade.py:310-348)
    metrics = M.gather_metrics(metrics)
    results = M.aggregate_metrics(metrics, epi_err_thr=cfg.trainer.epi_err_thr)
    if dump_dir is not None:
        os.makedirs(dump_dir, exist_ok=True)
        np.save(os.path.join(dump_dir, "pred_eval.npy"),
                np.asarray(dumps, dtype=object), allow_pickle=True)
    summary = profiler.summary()
    if summary:
        print(summary)
    return results


def main(argv=None):
    from casmtr_tpu.cli import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description="CasMTR-TPU benchmark evaluation")
    p.add_argument("--model", default="outdoor_casmtr_4c")
    p.add_argument("--data", default="megadepth_test_1500")
    p.add_argument("--ckpt", default=None,
                   help="orbax checkpoint dir or torch .ckpt to convert")
    p.add_argument("--max-pairs", type=int, default=None)
    p.add_argument("--profiler", default=None)
    p.add_argument("--dump-dir", default=None)
    p.add_argument("--thr", type=float, default=None,
                   help="override the coarse matching threshold "
                        "(reference test.py:36 --thr)")
    p.add_argument("--img-size", type=int, default=None,
                   help="override the test image resize "
                        "(reference test.py:28 --test_img_size)")
    p.add_argument("--overrides-json", default=None,
                   help="inline JSON config overrides (applied last)")
    p.add_argument("--pose-solver", default="cv2",
                   choices=("cv2", "device"),
                   help="cv2 = reference protocol (per-pair host RANSAC, "
                        "metrics.py:85-110); device = batched on-device "
                        "essential-matrix RANSAC (sfm/pose.py)")
    args = p.parse_args(argv)

    overrides = {}
    if args.thr is not None:
        overrides.setdefault("loftr", {}).setdefault(
            "match_coarse", {})["thr"] = args.thr
    if args.img_size is not None:
        overrides["dataset"] = {"mgdpt_img_resize": args.img_size}
    cfg = build_config(args.model, args.data, overrides or None)
    if args.overrides_json:
        from casmtr_tpu.config import override as cfg_override
        cfg = cfg_override(cfg, json.loads(args.overrides_json))
    model = build_model(cfg.loftr)
    size = cfg.dataset.mgdpt_img_resize
    init_batch = {
        "image0": jnp.zeros((1, size, size, 3), jnp.float32),
        "image1": jnp.zeros((1, size, size, 3), jnp.float32),
    }
    variables = jax.jit(
        lambda r: model.init(r, init_batch, train=False)
    )(jax.random.PRNGKey(0))  # one compile RPC, not ~300 eager ones
    if args.ckpt:
        from casmtr_tpu.train.checkpoints import load_checkpoint_variables
        variables = load_checkpoint_variables(args.ckpt, variables)

    results = run_eval(cfg, variables, max_pairs=args.max_pairs,
                       profiler_name=args.profiler, dump_dir=args.dump_dir,
                       pose_solver=args.pose_solver)
    print(json.dumps({k: float(v) for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
