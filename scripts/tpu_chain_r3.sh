#!/bin/bash
# Round-3 unattended TPU validation queue (run when the axon relay answers).
# Logs to /tmp/r3_*.log. ORDER: cheapest/most-informative first, and nothing
# that invalidates the warm .jax_cache graphs before they are re-measured.
#   1. WCA kernel on-device parity (--only wca): validates the _pad_lanes
#      Mosaic fix written after the 2026-08-18 23:07 compile failure.
#   2. bench re-warm twins (driver's end-of-round metric; cache still warm
#      from 2026-08-18 23:40 if no model code changed).
#   3. WCA-enabled bench (env opt-in) for the flip decision.
#   4. batched eval throughput table (b=1,2,4) — VERDICT #5.
#   5. pose solver bench.
set -u
cd /root/repo

run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3_${name}.log"
}

run wca_parity timeout 5400 python scripts/tpu_kernel_parity.py --only wca
run bench_twins timeout 7200 python bench.py --iters 10 --backbone twins
run bench_twins_wca timeout 7200 env CASMTR_PALLAS_WINDOW_CROSS=1 \
    python bench.py --iters 10 --backbone twins
run eval_b1 timeout 7200 python scripts/bench_eval_throughput.py --iters 20
run eval_b2 timeout 7200 python scripts/bench_eval_throughput.py --iters 10 --batch 2
run eval_b4 timeout 7200 python scripts/bench_eval_throughput.py --iters 10 --batch 4
run pose timeout 3600 python scripts/bench_pose_solver.py
echo "R3 CHAIN DONE $(date -u +%FT%TZ)"
