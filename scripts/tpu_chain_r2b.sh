#!/bin/bash
# Reordered TPU queue for the round-2 continuation session: the WCA
# parity gate runs right after the driver-critical bench_twins warm, so
# the flip decision can be made within the session even if later warms
# don't finish. Waits for an existing bench_twins process ($1) first.
set -u
cd /root/repo

if [ $# -ge 1 ]; then
    echo "waiting for pid $1 (bench_twins warm) ..."
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
    echo "pid $1 done at $(date)"
fi

run() {
    name=$1; shift
    echo "=== $name: $* === $(date)"
    ( "$@" ) > "/tmp/roundup_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/roundup_${name}.log"
}

run parity_wca python scripts/tpu_kernel_parity.py --only wca
run bench_twins_wca env CASMTR_PALLAS_WINDOW_CROSS=1 \
    python bench.py --iters 10 --backbone twins
run bench_resnet python bench.py --iters 10 --backbone resnet
run parity python scripts/tpu_kernel_parity.py
run eval_b1 python scripts/bench_eval_throughput.py --iters 20
run eval_b4 python scripts/bench_eval_throughput.py --iters 10 --batch 4
run pose python scripts/bench_pose_solver.py
echo "ALL DONE $(date)"
