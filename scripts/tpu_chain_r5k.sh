#!/bin/bash
# r5 chain K (waits for r5j): refresh the breadth numbers under the bf16
# compute policy — on-device kernel parity (inputs now arrive from bf16
# stacks), eval b2 + ScanNet geometry, quadtree_baseline + 2c step times,
# then a final timed fresh-process driver check so the round ends warm.
set -u
cd /root/repo
while ! grep -q "DONE r5j" /tmp/r5j_chain.log 2>/dev/null; do
    sleep 60
done
mkdir -p /tmp/r5k
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r5k/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -5 "/tmp/r5k/${name}.log"
}
run kernel_parity timeout 7200 python scripts/tpu_kernel_parity.py
run eval_b2 timeout 7200 python scripts/bench_eval_throughput.py --iters 20 --batch 2
run eval_scannet timeout 7200 python scripts/bench_eval_throughput.py \
    --iters 20 --size 640 --height 480 --backbone resnet
run bench_baseline timeout 7200 python bench.py --iters 10 --recipe quadtree_baseline
run bench_2c timeout 7200 python bench.py --iters 10 --recipe outdoor_casmtr_2c
echo "=== $(date -u +%FT%TZ) bench_driver_timed2 (fresh process)"
( time ( python bench.py ) ) > /tmp/r5k/bench_driver_timed2.log 2>&1
echo "--- exit=$? tail:"; tail -4 /tmp/r5k/bench_driver_timed2.log
echo "DONE r5k $(date -u +%FT%TZ)"
