"""Sequence reconstruction CLI: images -> matches -> tracks -> poses -> BA.

Drives the keyframe-partitioned SfM pipeline (sfm/pipeline.py, the
north-star capability of SURVEY.md §6) over a directory of images with
shared pinhole intrinsics. Outputs a JSON report (poses, track/match stats,
final BA cost) and optionally a PLY point cloud.

Example:
    python -m casmtr_tpu.cli.reconstruct /path/to/frames \\
        --fx 400 --fy 400 --cx 320 --cy 240 \\
        --resize 640 --out /tmp/recon.json --ply /tmp/recon.ply
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def write_ply(path: str, points: np.ndarray):
    """Minimal ASCII PLY writer for the BA point cloud."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(points)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        for x, y, z in np.asarray(points, np.float64):
            f.write(f"{x:.6f} {y:.6f} {z:.6f}\n")


def main(argv=None):
    from casmtr_tpu.cli import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description="CasMTR-TPU SfM reconstruction")
    p.add_argument("image_dir", help="directory of sequential frames "
                                     "(sorted by filename)")
    p.add_argument("--model", default="outdoor_casmtr_4c")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--resize", type=int, default=640)
    p.add_argument("--thr", type=float, default=0.2,
                   help="match confidence threshold")
    p.add_argument("--fx", type=float, required=True)
    p.add_argument("--fy", type=float, required=True)
    p.add_argument("--cx", type=float, required=True)
    p.add_argument("--cy", type=float, required=True)
    p.add_argument("--min-matches", type=int, default=100,
                   help="keyframe promotion threshold")
    p.add_argument("--max-gap", type=int, default=8)
    p.add_argument("--overlaps", type=int, nargs="+", default=[1, 2])
    p.add_argument("--ba-iters", type=int, default=20)
    p.add_argument("--huber", type=float, default=3.0,
                   help="Huber delta in px (<=0 for plain least squares)")
    p.add_argument("--keyframes", type=int, nargs="+", default=None,
                   help="explicit keyframe indices (skips adaptive "
                        "selection)")
    p.add_argument("--pose-solver", default="cv2",
                   choices=("cv2", "device"),
                   help="cv2 = per-pair host RANSAC; device = batched "
                        "on-device essential-matrix RANSAC (sfm/pose.py)")
    p.add_argument("--pgo", action="store_true",
                   help="refine the chained init with pose-graph "
                        "optimization over all matched pairs before BA "
                        "(sfm/pose_graph.py; cancels chain drift on long "
                        "sequences)")
    p.add_argument("--out", default="recon.json")
    p.add_argument("--ply", default=None)
    p.add_argument("--overrides-json", default=None,
                   help="inline JSON config overrides (applied last)")
    args = p.parse_args(argv)

    exts = (".png", ".jpg", ".jpeg", ".bmp", ".ppm")
    paths = sorted(
        os.path.join(args.image_dir, f) for f in os.listdir(args.image_dir)
        if f.lower().endswith(exts))
    if len(paths) < 3:
        raise SystemExit(f"need >= 3 frames, found {len(paths)}")
    print(f"{len(paths)} frames")

    import jax
    import jax.numpy as jnp
    from casmtr_tpu.configs import build_config
    from casmtr_tpu.data.io import load_im_padding
    from casmtr_tpu.models import build_model
    from casmtr_tpu.sfm import pipeline as pl
    from casmtr_tpu.sfm import reconstruct as Rc
    from casmtr_tpu.sfm.geometry import rodrigues

    cfg = build_config(args.model)
    if args.overrides_json:
        import json as _json
        from casmtr_tpu.config import override
        cfg = override(cfg, _json.loads(args.overrides_json))
    model = build_model(cfg.loftr)
    img0, img1, *_ = load_im_padding(paths[0], paths[1], resize=args.resize,
                                     df=32)
    init_b = {"image0": jnp.asarray(img0), "image1": jnp.asarray(img1)}
    variables = jax.jit(
        lambda r: model.init(r, init_b, train=False)
    )(jax.random.PRNGKey(0))  # one compile RPC, not ~300 eager ones
    if args.ckpt:
        from casmtr_tpu.train.checkpoints import load_checkpoint_variables
        variables = load_checkpoint_variables(args.ckpt, variables)

    K = np.array([[args.fx, 0, args.cx], [0, args.fy, args.cy], [0, 0, 1]])
    match_fn = pl.model_match_fn(cfg, variables, paths, resize=args.resize,
                                 thr=args.thr)
    res = pl.reconstruct_sequence(
        match_fn, len(paths), K, keyframes=args.keyframes,
        min_matches=args.min_matches, max_gap=args.max_gap,
        overlaps=tuple(args.overlaps), ba_iters=args.ba_iters,
        huber_delta=args.huber if args.huber > 0 else None,
        pose_solver=args.pose_solver, pgo=args.pgo)

    centers = Rc.camera_centers(res.problem)
    n_obs = int(np.asarray(res.problem.obs_valid).sum())
    rms = float(np.sqrt(res.cost / max(n_obs, 1) / 2))
    report = {
        "n_frames": len(paths),
        "keyframes": [int(k) for k in res.keyframes],
        "n_pairs": len(res.matches),
        "n_matches": {f"{i}-{j}": int(len(m[0]))
                      for (i, j), m in sorted(res.matches.items())},
        "n_tracks": len(res.tracks),
        "n_obs": n_obs,
        "ba_cost": res.cost,
        "rms_reproj_px_rho": rms,
        "poses": [{
            "frame": int(f),
            "R": np.asarray(rodrigues(res.problem.cam_rvec[a])).tolist(),
            "t": np.asarray(res.problem.cam_tvec[a]).tolist(),
            "center": centers[a].tolist(),
        } for a, f in enumerate(res.keyframes)],
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"keyframes={report['keyframes']} tracks={report['n_tracks']} "
          f"obs={n_obs} rms(rho)={rms:.2f}px")
    print(f"wrote {args.out}")
    if args.ply:
        write_ply(args.ply, np.asarray(res.problem.points))
        print(f"wrote {args.ply} ({len(res.problem.points)} points)")


if __name__ == "__main__":
    main()
