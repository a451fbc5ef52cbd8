#!/bin/bash
# Round-3 eleventh TPU chain: train batch-2 point WITH remat (remat-off b2
# OOMs HLO temps at 704^2 — r3i).
set -u
cd /root/repo
while ! grep -q "R3L CHAIN DONE" /tmp/r3l_chain.log 2>/dev/null; do
    sleep 120
done
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3m_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3m_${name}.log"
}
run bench_twins_b2_remat timeout 10800 python bench.py --iters 8 --batch 2 --remat
echo "R3M CHAIN DONE $(date -u +%FT%TZ)"
