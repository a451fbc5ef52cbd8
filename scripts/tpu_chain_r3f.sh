#!/bin/bash
# Round-3 fourth TPU chain: eval-throughput table completion (WCA default-on):
# batch 1 retry (the r3e mid-run script edit skipped it) + batch 2.
set -u
cd /root/repo

run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3f_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3f_${name}.log"
}

run eval_b1_wca timeout 7200 python scripts/bench_eval_throughput.py --iters 20
run eval_b2_wca timeout 7200 python scripts/bench_eval_throughput.py --iters 10 --batch 2
echo "R3F CHAIN DONE $(date -u +%FT%TZ)"
