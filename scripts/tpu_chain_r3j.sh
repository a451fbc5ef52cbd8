#!/bin/bash
# Round-3 eighth TPU chain: ScanNet-protocol (640x480) eval throughput —
# the indoor north-star geometry never measured before.
set -u
cd /root/repo

while ! grep -q "R3I CHAIN DONE" /tmp/r3i_chain.log 2>/dev/null; do
    sleep 120
done

run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3j_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3j_${name}.log"
}

run eval_scannet timeout 10800 python scripts/bench_eval_throughput.py \
    --iters 20 --size 640 --height 480
echo "R3J CHAIN DONE $(date -u +%FT%TZ)"
