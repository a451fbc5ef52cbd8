"""Multi-replica serving scaling on the virtual CPU mesh (VERDICT r3 #4):
batch-1-per-replica data-parallel serving vs single-device serving of the
same pairs, via serving.Matcher's mesh path.

Absolute numbers on CPU are meaningless for TPU; what this measures is the
SCALING SHAPE of the serving design: N replicas process N pairs in one
dispatch with per-replica batch 1 (the per-chip-optimal batch, BASELINE.md),
so ideal wall is ~= the single-pair wall. The collective-free forward means
the only sharing is host packing + dispatch.

  python scripts/bench_serving_replicas.py [--bucket 256] [--n 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, default=256)
    ap.add_argument("--n", type=int, default=8, help="replica count")
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()

    from jax.sharding import Mesh
    from casmtr_tpu.serving import Matcher

    rng = np.random.default_rng(0)
    pairs = [(rng.random((300, 400, 3)).astype(np.float32),
              rng.random((300, 400, 3)).astype(np.float32))
             for _ in range(a.n)]

    single = Matcher(bucket=a.bucket, thr=0.0)
    single.warmup(batch_sizes=(1,))
    t0 = time.time()
    for _ in range(a.reps):
        single.match(*pairs[0])
    t1 = (time.time() - t0) / a.reps

    mesh = Mesh(np.asarray(jax.devices()[:a.n]), ("data",))
    served = Matcher(bucket=a.bucket, thr=0.0, mesh=mesh)
    served.warmup(batch_sizes=(a.n,))
    t0 = time.time()
    for _ in range(a.reps):
        served.match_batch(pairs)
    tn = (time.time() - t0) / a.reps

    print(json.dumps({
        "metric": "serving_replica_scaling",
        "bucket": a.bucket, "replicas": a.n,
        "t_single_pair_s": round(t1, 3),
        "t_n_pairs_sharded_s": round(tn, 3),
        "pairs_per_dispatch_wall": round(a.n / tn, 3),
        "scaling_efficiency": round(t1 * a.n / (tn * a.n), 3),
        "note": "virtual CPU mesh shares this host's cores; on real chips "
                "each replica owns its compute and ideal tn ~= t1",
    }), flush=True)


if __name__ == "__main__":
    main()
