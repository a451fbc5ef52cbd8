#!/bin/bash
# Round-4 third TPU chain (after r4c): eval-batching diagnosis + final
# throughput numbers with the exp2 kernel.
#   1. trace_eval b1 and b4 at 832^2 — attribute the residual superlinear
#      candidate-gather scaling (VERDICT r3 #4) to named ops
#   2. bench_eval_throughput b1 (the headline pairs/s/chip, re-measured)
#   3. bench.py re-warm so the driver's run hits the compile cache
set -u
cd /root/repo
while ! grep -q "R4C CHAIN DONE" /tmp/r4/chain_r4c.log 2>/dev/null; do
    sleep 60
done
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r4/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -5 "/tmp/r4/${name}.log"
}
run trace_eval_b1 timeout 5400 python scripts/trace_eval.py --batch 1
run trace_eval_b4 timeout 5400 python scripts/trace_eval.py --batch 4
run eval_tp_b1 timeout 5400 python scripts/bench_eval_throughput.py
run bench_rewarm timeout 5400 python bench.py
echo "R4E CHAIN DONE $(date -u +%FT%TZ)"
