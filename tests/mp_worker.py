"""Multi-process worker for world>1 tests (spawned by test_multiprocess.py).

Each mode exercises a cross-HOST code path that the 8-device virtual mesh
cannot (device sharding != host semantics): object all_gather payload
padding, rank-dependent control flow, per-process batch assembly, and the
SfM pair-partition merge. Reference equivalents: src/utils/comm.py:142-220
(gloo object gathers) and PL DDP process semantics (train.py:136-148).

Usage: python mp_worker.py <mode> <pid> <nproc> <port> [extra...]
Prints one line starting with RESULT_JSON: per process.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode, pid, nproc, port = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), \
    sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("CASMTR_KERNEL_BACKEND", "jnp")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def emit(payload):
    print("RESULT_JSON:" + json.dumps(payload), flush=True)


def init():
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)


if mode == "comm":
    init()
    from casmtr_tpu.parallel import comm
    # unequal pickled payload sizes across ranks (the reference's pad-to-max
    # scheme, comm.py:96-178)
    objs = comm.all_gather({"rank": pid, "blob": "x" * (7 + 137 * pid)})
    got_gather0 = comm.gather({"r": pid}, dst=0)
    red = comm.reduce_dict({"a": float(pid), "b": 2.0}, average=True)
    red_sum = comm.reduce_dict({"a": float(pid)}, average=False)
    arrs = comm.all_gather_arrays(np.asarray([pid, pid * 3], np.int64))
    emit({
        "world": comm.get_world_size(),
        "rank": comm.get_rank(),
        "obj_ranks": [o["rank"] for o in objs],
        "obj_lens": [len(o["blob"]) for o in objs],
        "gather0_len": len(got_gather0),
        "reduce_mean_a": red["a"], "reduce_mean_b": red["b"],
        "reduce_sum_a": red_sum["a"],
        "arrs": np.asarray(arrs).tolist(),
    })

elif mode == "sfm":
    init()
    from casmtr_tpu.sfm import pipeline

    def fake_match(i, j):
        # deterministic per-pair output, same on any rank that computes it
        n = 3 + (i + j) % 4
        mk = np.full((n, 2), float(i * 100 + j), np.float32)
        return mk, mk + 1.0, np.ones(n, np.float32)

    # 7 pairs over 2 ranks: NOT divisible -> exercises the padded-duplicate
    # first-host-wins merge
    pairs = [(a, a + 1) for a in range(6)] + [(0, 3)]
    merged = pipeline.match_pairs(fake_match, pairs, world=None, rank=None)
    emit({
        "rank": jax.process_index(),
        "n_pairs": len(merged),
        "keys": sorted([list(k) for k in merged.keys()]),
        "counts": {f"{k[0]}-{k[1]}": int(v[0].shape[0])
                   for k, v in merged.items()},
    })

elif mode == "cli":
    # full training CLI under 2 processes via its own --dist entry
    scene_dir, run_dir = sys.argv[5], sys.argv[6]
    from tests.test_train_cli import _tiny_overrides
    from casmtr_tpu.cli.train import main
    ov = _tiny_overrides(scene_dir, n_samples=4)
    main(["--model", "outdoor_casmtr_4c", "--run-dir", run_dir,
          "--epochs", "1", "--stage", "1", "--num-workers", "0",
          "--log-every", "1", "--max-val-pairs", "1",
          "--sanity-val-steps", "0",
          "--dist-coordinator", f"localhost:{port}",
          "--dist-num-processes", str(nproc),
          "--dist-process-id", str(pid),
          "--overrides-json", json.dumps(ov)])
    # after main(): verify replicated state consistency is checkable from
    # the run artifacts on rank 0 (the test asserts on these)
    emit({"rank": jax.process_index(), "world": jax.process_count(),
          "devices": jax.device_count(), "done": True})

else:
    raise SystemExit(f"unknown mode {mode}")
