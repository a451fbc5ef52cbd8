"""Device-mesh utilities for data-parallel (and future multi-host) execution.

The reference's parallelism is DDP-over-NCCL data parallelism with per-rank
scene-sharded input (reference train.py:136-148, src/lightning/data.py:179).
The TPU-native equivalent (SURVEY.md §2.9): a 1-D ``data`` mesh, batch sharded
over it, params replicated, everything under one ``jax.jit`` — XLA/GSPMD
inserts the gradient all-reduce over ICI and computes batch-norm statistics
over the global batch (the SyncBN equivalent).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Place every array in the batch with its leading dim sharded.

    Multi-host: each process passes only ITS slice of the global batch
    (local_device_count * per-device batch rows) and the global array is
    assembled from the per-process shards — no host loads the full global
    batch."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
