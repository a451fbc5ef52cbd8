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
    """Top-k by metric + always-keep-latest, via orbax.

    orbax's best-N retention alone DELETES the newest step whenever its
    metric is not top-k (verified against the installed policy), so 'last'
    lives in a sibling ``<directory>_last`` manager (max_to_keep=1) — the PL
    ``save_top_k + save_last`` semantics (reference train.py:127-129).
    ``restore()`` picks the newest step across both."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 metric_name: str = "auc@10", keep_last: bool = True):
        self.metric_name = metric_name
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m.get(metric_name, -1.0),
            best_mode="max",
            create=True,
        )
        directory = os.path.abspath(directory)
        self.mgr = ocp.CheckpointManager(directory, options=options)
        self.last_mgr = None
        if keep_last:
            self.last_mgr = ocp.CheckpointManager(
                directory.rstrip("/") + "_last",
                options=ocp.CheckpointManagerOptions(max_to_keep=1,
                                                     create=True))

    def save(self, step: int, state, metrics: Optional[Dict] = None):
        self.mgr.save(step, args=ocp.args.StandardSave(state),
                      metrics=metrics or {})
        self.mgr.wait_until_finished()
        if self.last_mgr is not None:
            self.last_mgr.save(step, args=ocp.args.StandardSave(state))
            self.last_mgr.wait_until_finished()

    def _manager_for(self, step: Optional[int]):
        """(manager, step): newest across best + last when step is None."""
        candidates = []
        for m in (self.mgr, self.last_mgr):
            if m is None:
                continue
            s = (step if step is not None and step in m.all_steps()
                 else (m.latest_step() if step is None else None))
            if s is not None:
                candidates.append((s, 0 if m is self.mgr else 1, m))
        if not candidates:
            return None, None
        s, _, m = max(candidates)
        return m, s

    def restore(self, step: Optional[int] = None, target=None):
        mgr, step = self._manager_for(step)
        if mgr is None:
            return None
        if target is not None:
            return mgr.restore(step, args=ocp.args.StandardRestore(target))
        return mgr.restore(step)

    def latest_step(self):
        steps = [m.latest_step() for m in (self.mgr, self.last_mgr)
                 if m is not None and m.latest_step() is not None]
        return max(steps) if steps else None

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
