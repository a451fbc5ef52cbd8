"""CLI entry points (train / evaluate / match_pair / reconstruct / convert).

Every CLI enables the persistent XLA compilation cache before building any
jitted computation: the flagship graphs take minutes (GPU) to tens of
minutes (remote-compiled TPU) to compile, and without the on-disk cache
every invocation pays that again — a 704² training run spent ~40 min
recompiling a graph bench.py had already built, because only the bench
script configured the cache.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path``.

    Resolution order: explicit arg > $CASMTR_JAX_CACHE_DIR > repo-local
    ``.jax_cache`` if running from a source checkout (keeps one cache shared
    with bench.py / scripts) > ``~/.cache/casmtr-tpu/jax``.
    """
    import jax

    if path is None:
        path = os.environ.get("CASMTR_JAX_CACHE_DIR")
    if path is None:
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        repo_cache = os.path.join(repo, ".jax_cache")
        if os.path.isdir(repo_cache) or os.path.isfile(
                os.path.join(repo, "bench.py")):
            path = repo_cache
        else:
            path = os.path.expanduser("~/.cache/casmtr-tpu/jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # persist EVERY compile: on the axon relay each eager op is a remote
    # compile RPC (~0.5-60 s), so even "trivial" graphs are worth caching
    # cross-process (the default threshold would skip them and every fresh
    # process would re-pay minutes of init)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return path
