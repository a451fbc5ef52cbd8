"""Cross-host communication for metric/object aggregation.

The reference uses a cached gloo process group for arbitrary-picklable
all_gather/gather of metrics (reference: src/utils/comm.py:84-220, copied from
detectron2). TPU-native equivalent: ``jax.experimental.multihost_utils`` for
arrays; python objects are serialized to uint8 arrays and padded to the max
length (exactly the reference's tensor-serialize + pad + all_gather scheme,
comm.py:96-178).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def all_gather_arrays(x: np.ndarray) -> np.ndarray:
    """Gather a same-shape array from every host -> stacked [world, ...]."""
    if get_world_size() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def all_gather(obj: Any) -> List[Any]:
    """Gather arbitrary picklable objects from all hosts
    (reference comm.py:142-178 semantics)."""
    world = get_world_size()
    if world == 1:
        return [obj]
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = all_gather_arrays(np.asarray([payload.size], np.int64))[:, 0]
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[:payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(gathered[r, :int(sizes[r])].tobytes())
            for r in range(world)]


def gather(obj: Any, dst: int = 0) -> List[Any]:
    """Gather to one host (others get []); reference comm.py:180-220.
    Implemented as all_gather (collectives on TPU are symmetric)."""
    out = all_gather(obj)
    return out if get_rank() == dst else []


def reduce_dict(d: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Mean/sum of scalar dicts across hosts (reference comm.py:237-266)."""
    keys = sorted(d)
    vals = np.asarray([float(d[k]) for k in keys], np.float64)
    stacked = all_gather_arrays(vals)
    red = stacked.mean(0) if average else stacked.sum(0)
    return dict(zip(keys, red.tolist()))
