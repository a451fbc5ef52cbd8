"""Profiling utilities (reference: src/utils/profiler.py:8-40).

The reference wraps PL SimpleProfiler with ``torch.cuda.synchronize`` for
honest GPU timings and offers a torch profiler variant. TPU-native
equivalents: wall-clock regions fenced by ``block_until_ready`` + named
``jax.profiler`` trace annotations viewable in XProf/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp


class PassThroughProfiler:
    """No-op profiler (reference profiler.py default)."""

    @contextlib.contextmanager
    def profile(self, name: str):
        with jax.named_scope(name):
            yield

    def summary(self) -> str:
        return ""


class InferenceProfiler(PassThroughProfiler):
    """Wall-clock region profiler with device fencing
    (reference profiler.py:8-28 InferenceProfiler semantics). Regions are also
    emitted as jax.profiler trace annotations.

    The fence: a trailing scalar fetch. Device streams execute in order, so
    completing a trivial computation enqueued AFTER the region implies the
    region's device work finished — `jax.block_until_ready` alone is not
    reliable through the axon relay (CLAUDE.md), and without any fence async
    dispatch makes every region look like ~0 ms. Regions that already fetch
    their outputs pay only a negligible extra scalar."""

    def __init__(self):
        self.times = defaultdict(list)

    @contextlib.contextmanager
    def profile(self, name: str):
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
            float(jnp.zeros(()))  # in-order fence (see class docstring)
        self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> str:
        lines = [f"{'Region':40s} {'Calls':>6s} {'Mean (s)':>10s} "
                 f"{'Total (s)':>10s}"]
        for name, ts in sorted(self.times.items()):
            lines.append(f"{name:40s} {len(ts):6d} "
                         f"{sum(ts) / len(ts):10.4f} {sum(ts):10.4f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture an XProf/Perfetto trace for the enclosed region
    (``jax.profiler.trace``); no-op if log_dir is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def build_profiler(name: Optional[str]):
    """reference profiler.py:31-40 dispatch."""
    if name is None:
        return PassThroughProfiler()
    if name == "inference":
        return InferenceProfiler()
    raise ValueError(f"unknown profiler {name}")
