#!/bin/bash
# Round-3 third TPU chain: runs after tpu_chain_r3b (waits for its final
# log line). Fresh traces at the new 0.3984 s/step operating point
# (VERDICT r2 #4) + the batched-eval scaling diagnosis.
set -u
cd /root/repo

while ! grep -q "R3D CHAIN DONE" /tmp/r3d_chain.log 2>/dev/null; do
    sleep 120
done

run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3e_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3e_${name}.log"
}

run trace_step timeout 7200 python scripts/trace_step.py
run trace_eval_b1 timeout 7200 python scripts/trace_eval.py --batch 1
run trace_eval_b4 timeout 7200 python scripts/trace_eval.py --batch 4
# retry of r3d's eval_b1_wca (relay transport flake mid-compile) + b4
run eval_b1_wca timeout 7200 python scripts/bench_eval_throughput.py --iters 20
run eval_b4_wca timeout 7200 python scripts/bench_eval_throughput.py --iters 10 --batch 4
echo "R3E CHAIN DONE $(date -u +%FT%TZ)"
