"""Orbax checkpoint management (reference: PL ModelCheckpoint monitoring
auc@10 with save_top_k=3 + save_last, train.py:127-129; multi-stage resume
with fresh modules, lightning_cascade.py:127-159)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Top-k by metric + always-keep-latest, via orbax."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 metric_name: str = "auc@10"):
        self.metric_name = metric_name
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m.get(metric_name, -1.0),
            best_mode="max",
            create=True,
        )
        self.mgr = ocp.CheckpointManager(
            os.path.abspath(directory), options=options)

    def save(self, step: int, state, metrics: Optional[Dict] = None):
        self.mgr.save(step, args=ocp.args.StandardSave(state),
                      metrics=metrics or {})
        self.mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, target=None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        if target is not None:
            return self.mgr.restore(
                step, args=ocp.args.StandardRestore(target))
        return self.mgr.restore(step)

    def latest_step(self):
        return self.mgr.latest_step()

    def best_step(self):
        return self.mgr.best_step()


def load_into_state(restored, state):
    """Non-strict merge of a restored (possibly smaller, earlier-stage)
    checkpoint into a fresh state: params present in both are taken from the
    checkpoint; new-stage modules keep their fresh init (the reference resumes
    stage-1 checkpoints into bigger stage-2/3 models the same way;
    lightning_cascade.py:127-159 / torch_init_model)."""

    def merge(new, old):
        if isinstance(new, dict) and isinstance(old, dict):
            return {k: merge(v, old[k]) if k in old else v
                    for k, v in new.items()}
        if old is None:
            return new
        if hasattr(new, "shape") and hasattr(old, "shape") \
                and tuple(new.shape) != tuple(np.shape(old)):
            return new
        return old

    return merge(state, restored)


def load_checkpoint_variables(path: str, variables: Dict) -> Dict:
    """Load model weights into ``variables`` from either a released torch
    .ckpt/.pth (converted in memory) or a native orbax directory.

    The orbax path restores WITHOUT a target (train checkpoints carry
    params/batch_stats/opt_state/step; a params-only target tree makes
    orbax raise a structure mismatch) and non-strictly merges params AND
    batch_stats — dropping batch_stats would silently evaluate with
    fresh-init BN statistics."""
    if path.endswith((".ckpt", ".pth")):
        from casmtr_tpu.utils.convert import (convert_state_dict,
                                              load_torch_checkpoint)
        variables, report = convert_state_dict(load_torch_checkpoint(path),
                                               dict(variables))
        print(f"converted torch checkpoint: {len(report['missing'])} "
              f"missing, {len(report['unused'])} unused keys")
        return variables
    restored = CheckpointManager(path).restore()
    if restored is None:
        raise FileNotFoundError(f"no orbax checkpoint found in {path}")
    out = dict(variables)
    out["params"] = load_into_state(restored.get("params"),
                                    variables["params"])
    if variables.get("batch_stats") is not None \
            and restored.get("batch_stats") is not None:
        out["batch_stats"] = load_into_state(restored["batch_stats"],
                                             variables["batch_stats"])
    return out
