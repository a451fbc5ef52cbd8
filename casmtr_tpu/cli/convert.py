"""Standalone checkpoint converter: released torch .ckpt/.pth -> native orbax
directory (+ the config it was converted under), so deployments convert once
instead of re-converting in memory at every startup.

The reference has no counterpart (its checkpoints load natively); the mapping
itself lives in utils/convert.py and is parity-tested against the reference's
own torch modules (tests/test_ref_parity.py).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


def main(argv=None):
    from casmtr_tpu.cli import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(
        description="Convert a released torch checkpoint to orbax")
    p.add_argument("ckpt", help="torch .ckpt/.pth path")
    p.add_argument("out", help="output orbax directory")
    p.add_argument("--model", default="outdoor_casmtr_4c")
    p.add_argument("--overrides-json", default=None,
                   help="inline JSON config overrides (must match the "
                        "checkpoint's architecture)")
    p.add_argument("--strict", action="store_true",
                   help="fail on any missing/unused key")
    args = p.parse_args(argv)

    from casmtr_tpu.config import dump, override
    from casmtr_tpu.configs import build_config
    from casmtr_tpu.models import build_model
    from casmtr_tpu.train.checkpoints import CheckpointManager
    from casmtr_tpu.utils.convert import (convert_state_dict,
                                          load_torch_checkpoint)

    cfg = build_config(args.model)
    if args.overrides_json:
        cfg = override(cfg, json.loads(args.overrides_json))

    model = build_model(cfg.loftr)
    size = 8 * cfg.dataset.mgdpt_df  # smallest geometry; params are
    init_batch = {                   # image-size independent
        "image0": jnp.zeros((1, size, size, 3), jnp.float32),
        "image1": jnp.zeros((1, size, size, 3), jnp.float32),
    }
    variables = jax.jit(
        lambda r: model.init(r, init_batch, train=False)
    )(jax.random.PRNGKey(0))

    sd = load_torch_checkpoint(args.ckpt)
    variables, report = convert_state_dict(sd, dict(variables),
                                           strict=args.strict)
    print(f"converted: {len(report['missing'])} missing, "
          f"{len(report['unused'])} unused")
    for k in report["missing"][:10]:
        print(f"  missing: {k}")
    for k in report["unused"][:10]:
        print(f"  unused:  {k}")

    mgr = CheckpointManager(args.out, max_to_keep=1)
    state = {"params": variables["params"]}
    if variables.get("batch_stats"):
        state["batch_stats"] = variables["batch_stats"]
    mgr.save(0, jax.device_get(state))
    dump(cfg, f"{args.out}/config.json")
    print(f"wrote orbax checkpoint + config.json to {args.out}")


if __name__ == "__main__":
    main()
