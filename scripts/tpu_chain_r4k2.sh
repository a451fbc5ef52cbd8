#!/bin/bash
# Round-4 eighth TPU chain: breadth rows — the 2c recipe's train step and
# the quadtree-LoFTR baseline recipe's train step at the reference
# geometry (both never benched on device), then one final uncontended
# cold-process driver-bench timing for the record.
set -u
cd /root/repo
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r4/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r4/${name}.log"
}
run bench_2c timeout 5400 python bench.py --recipe outdoor_casmtr_2c
run bench_quadtree timeout 5400 python bench.py --recipe quadtree_baseline
echo "=== $(date -u +%FT%TZ) bench_cold_final (driver command, fresh process)"
( time ( if [ -f bench.py ]; then python bench.py; else exit 0; fi ) ) \
    > /tmp/r4/bench_cold_final.log 2>&1
echo "--- exit=$? tail:"; tail -3 /tmp/r4/bench_cold_final.log
echo "R4K2 CHAIN DONE $(date -u +%FT%TZ)"
