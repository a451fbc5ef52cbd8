#!/bin/bash
# Round-3 tenth TPU chain: ResNetFPN variant re-bench with the WCA kernel
# (BASELINE.md row is still the pre-WCA r2 number).
set -u
cd /root/repo

while ! grep -q "R3K CHAIN DONE" /tmp/r3k_chain.log 2>/dev/null; do
    sleep 120
done

run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3l_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3l_${name}.log"
}

run bench_resnet timeout 10800 python bench.py --iters 10 --backbone resnet
echo "R3L CHAIN DONE $(date -u +%FT%TZ)"
