#!/bin/bash
# r5 chain D (waits for r5c): breadth benches with the r5 kernels —
# eval throughput b1/b2/b4 (does one-hot selection fix the negative batch
# scaling?), ScanNet protocol geometry, and the other recipes' step times.
set -u
cd /root/repo
while ! grep -q "DONE r5c" /tmp/r5c_chain.log 2>/dev/null; do
    sleep 60
done
mkdir -p /tmp/r5
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r5/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -5 "/tmp/r5/${name}.log"
}
run eval_b1 timeout 7200 python scripts/bench_eval_throughput.py --iters 20
run eval_b2 timeout 7200 python scripts/bench_eval_throughput.py --iters 20 --batch 2
run eval_b4 timeout 7200 python scripts/bench_eval_throughput.py --iters 20 --batch 4
run eval_scannet timeout 7200 python scripts/bench_eval_throughput.py \
    --iters 20 --size 640 --height 480 --backbone resnet
run bench_baseline timeout 7200 python bench.py --iters 10 --recipe quadtree_baseline
run bench_2c timeout 7200 python bench.py --iters 10 --recipe outdoor_casmtr_2c
echo "DONE r5d"
