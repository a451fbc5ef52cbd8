"""Single-pair matching demo (reference: test_single_pair.py:26-104):
load two images, run the matcher, draw matches to result.jpg."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from casmtr_tpu.config import override
from casmtr_tpu.configs import build_config
from casmtr_tpu.data.io import load_im_padding
from casmtr_tpu.models import build_model


def make_matcher(cfg, variables, resize: int = 1024, thr: float = 0.2):
    """Build a reusable ``fn(path0, path1) -> (mkpts0, mkpts1, mconf)``.

    The model apply is jitted ONCE and shared across calls: same-shaped
    pairs (any sequence of same-size frames) hit the compile cache instead
    of paying a retrace per pair (through the axon relay a retrace is a
    multi-minute remote compile)."""
    model = build_model(cfg.loftr)
    apply_fn = jax.jit(lambda v, b: model.apply(v, b, train=False))

    def fn(path0: str, path1: str):
        img0, img1, mask0, mask1, scale0, scale1 = load_im_padding(
            path0, path1, resize=resize, df=32)
        batch = {
            "image0": jnp.asarray(img0), "image1": jnp.asarray(img1),
            "mask0": jnp.asarray(mask0), "mask1": jnp.asarray(mask1),
            "scale0": jnp.asarray(scale0[None]),
            "scale1": jnp.asarray(scale1[None]),
        }
        out = apply_fn(variables, batch)
        fm = out.final_matches
        valid = np.asarray(fm.valid) & (np.asarray(fm.mconf) > thr)
        return (np.asarray(fm.mkpts0)[valid], np.asarray(fm.mkpts1)[valid],
                np.asarray(fm.mconf)[valid])

    return fn


def match_pair(cfg, variables, path0: str, path1: str, resize: int = 1024,
               thr: float = 0.2):
    """Returns (mkpts0, mkpts1, mconf) in ORIGINAL image pixel coords."""
    return make_matcher(cfg, variables, resize=resize, thr=thr)(path0, path1)


def main(argv=None):
    from casmtr_tpu.cli import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description="CasMTR-TPU single-pair demo")
    p.add_argument("img0")
    p.add_argument("img1")
    p.add_argument("--model", default="outdoor_casmtr_4c")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--resize", type=int, default=1024)
    p.add_argument("--thr", type=float, default=0.2)
    p.add_argument("--out", default="result.jpg")
    p.add_argument("--overrides-json", default=None,
                   help="inline JSON config overrides (e.g. to select a "
                        "post-process method)")
    p.add_argument("--nms", action="store_true",
                   help="enable maxpool NMS post-processing (reference "
                        "test_single_pair.py:33-40)")
    args = p.parse_args(argv)

    cfg = build_config(args.model)
    if args.overrides_json:
        import json as _json
        cfg = override(cfg, _json.loads(args.overrides_json))
    if args.nms:
        cfg = override(cfg, {"loftr": {"coarse2": {"post_config": {
            "method": "maxpool_nms", "window_size": 5}}}})

    model = build_model(cfg.loftr)
    img0, img1, mask0, mask1, scale0, scale1 = load_im_padding(
        args.img0, args.img1, resize=args.resize, df=32)
    init_batch = {"image0": jnp.asarray(img0), "image1": jnp.asarray(img1)}
    variables = jax.jit(
        lambda r: model.init(r, init_batch, train=False)
    )(jax.random.PRNGKey(0))  # one compile RPC, not ~300 eager ones
    if args.ckpt:
        from casmtr_tpu.train.checkpoints import load_checkpoint_variables
        variables = load_checkpoint_variables(args.ckpt, variables)

    mk0, mk1, mconf = match_pair(cfg, variables, args.img0, args.img1,
                                 resize=args.resize, thr=args.thr)
    print(f"{len(mk0)} matches")

    import cv2
    from casmtr_tpu.utils.plotting import make_matching_figure
    im0 = cv2.cvtColor(cv2.imread(args.img0), cv2.COLOR_BGR2RGB) / 255.0
    im1 = cv2.cvtColor(cv2.imread(args.img1), cv2.COLOR_BGR2RGB) / 255.0
    color = np.zeros((len(mk0), 4))
    color[:, 1] = 1.0
    color[:, 3] = np.clip(mconf, 0.2, 1.0) if len(mconf) else 1.0
    make_matching_figure(im0, im1, mk0, mk1, color,
                         text=[f"CasMTR-TPU: {len(mk0)} matches"],
                         path=args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
