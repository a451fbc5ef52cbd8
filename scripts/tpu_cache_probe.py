"""Root-cause the axon persistent-compile-cache cross-process misses
(VERDICT r4 #1): compile a tiny fixed graph with jax_explain_cache_misses
on, in a fresh cache dir; run this script TWICE in separate processes and
compare the logged cache keys / miss explanations.

  python scripts/tpu_cache_probe.py leg_a
  python scripts/tpu_cache_probe.py leg_b
"""

import logging
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/r4/cache_probe")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_explain_cache_misses", True)

logging.basicConfig(level=logging.DEBUG)
for name in ("jax._src.compilation_cache", "jax._src.cache_key",
             "jax._src.compiler"):
    logging.getLogger(name).setLevel(logging.DEBUG)

import jax.numpy as jnp

tag = sys.argv[1] if len(sys.argv) > 1 else "leg"
print("devices:", jax.devices(), flush=True)

# dump the pieces that feed the cache key
dev = jax.devices()[0]
client = dev.client
print("platform:", client.platform, flush=True)
print("platform_version:", repr(client.platform_version), flush=True)
print("runtime_type:", getattr(client, "runtime_type", "?"), flush=True)
print("device str:", str(dev), repr(getattr(dev, "device_kind", "?")),
      flush=True)
print("jax:", jax.__version__, flush=True)


@jax.jit
def f(x):
    return (x @ x.T).sum() * 3.0


t0 = time.perf_counter()
out = float(f(jnp.ones((256, 256), jnp.float32)))
print(f"{tag}: first call {time.perf_counter()-t0:.2f}s out={out}",
      flush=True)
