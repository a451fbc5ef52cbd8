#!/bin/bash
# r5 chain Q: refresh the two stale BASELINE rows under the final bf16
# policy — the ResNetFPN 4c variant (last measured r3: 0.3715) and the
# batch-2 remat step (last measured r3: 1.130).
set -u
cd /root/repo
mkdir -p /tmp/r5q
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r5q/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -2 "/tmp/r5q/${name}.log"
}
run bench_resnet timeout 7200 python bench.py --iters 10 --backbone resnet
run bench_b2_remat timeout 7200 python bench.py --iters 10 --batch 2 --remat
echo "DONE r5q $(date -u +%FT%TZ)"
