#!/bin/bash
# Round-4 fourth TPU chain: redo the eval traces that crashed on the relay
# transport during eager-init compile storms (trace_eval now jits its init),
# then the b4 eval throughput row.
set -u
cd /root/repo
while ! grep -q "R4E CHAIN DONE" /tmp/r4/chain_r4e.log 2>/dev/null; do
    sleep 60
done
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r4/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -5 "/tmp/r4/${name}.log"
}
if ! grep -q "TOTAL device-attributed" /tmp/r4/trace_eval_b1.log 2>/dev/null; then
    run trace_eval_b1_retry timeout 5400 python scripts/trace_eval.py --batch 1
fi
if ! grep -q "TOTAL device-attributed" /tmp/r4/trace_eval_b4.log 2>/dev/null; then
    run trace_eval_b4_retry timeout 5400 python scripts/trace_eval.py --batch 4
fi
run eval_tp_b4 timeout 5400 python scripts/bench_eval_throughput.py --batch 4
echo "R4F CHAIN DONE $(date -u +%FT%TZ)"
