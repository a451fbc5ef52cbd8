#!/bin/bash
# Round-3 seventh TPU chain: train-geometry batch point (VERDICT r2 #5) and
# the batched-eval re-measure with the gather mode="clip" code.
set -u
cd /root/repo

while ! grep -q "R3H CHAIN DONE" /tmp/r3h_chain.log 2>/dev/null; do
    sleep 120
done

run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3i_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3i_${name}.log"
}

run eval_b4_clip timeout 10800 python scripts/bench_eval_throughput.py --iters 10 --batch 4
run bench_twins_b2 timeout 10800 python bench.py --iters 8 --batch 2
echo "R3I CHAIN DONE $(date -u +%FT%TZ)"
