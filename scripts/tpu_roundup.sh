#!/bin/bash
# Unattended TPU validation queue for when the axon relay comes back.
# Runs, in order, logging to /tmp/roundup_*.log:
#   1. on-device kernel parity + timings (incl. the new WCA section)
#   2. bench re-warm for both backbones (model code changed since the
#      last .jax_cache warm: quadtree.py patch-gather removal)
#   3. bench with the WCA kernel enabled (env opt-in) for comparison
# Inspect the logs; if WCA parity holds and the kernel wins, flip the
# CASMTR_PALLAS_WINDOW_CROSS default in gather_ops.py and re-warm once more.
set -u
cd /root/repo

run() {
    name=$1; shift
    echo "=== $name: $* ==="
    ( "$@" ) > "/tmp/roundup_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/roundup_${name}.log"
}

# ORDER MATTERS: the driver's end-of-round bench runs `bench.py` (twins) —
# re-warm that graph first so BENCH_r02 is covered even if the relay drops
# again mid-queue.
run bench_twins python bench.py --iters 10 --backbone twins
run bench_resnet python bench.py --iters 10 --backbone resnet
run parity python scripts/tpu_kernel_parity.py
run bench_twins_wca env CASMTR_PALLAS_WINDOW_CROSS=1 \
    python bench.py --iters 10 --backbone twins
# serving throughput: eval forward, single-pair and batched
run eval_b1 python scripts/bench_eval_throughput.py --iters 20
run eval_b4 python scripts/bench_eval_throughput.py --iters 10 --batch 4
run pose python scripts/bench_pose_solver.py
echo "ALL DONE"
