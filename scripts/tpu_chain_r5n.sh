#!/bin/bash
# r5 chain N: verify the MODE-DEPENDENT transformer dtype policy (bf16 in
# eval, f32 in train — r5l/r5m A/B verdict) on device. Expect bench ~0.339
# (the r5l tf32-leg semantics) and eval b1 ~5.87 (the full-bf16 graph).
# All graphs rekey (source edit), so every leg pays one compile.
set -u
cd /root/repo
mkdir -p /tmp/r5n
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r5n/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -2 "/tmp/r5n/${name}.log"
}
run match_pair timeout 5400 python -m casmtr_tpu.cli.match_pair \
    /tmp/r5j/pair0.png /tmp/r5j/pair1.png --resize 384 --thr 0 \
    --out /tmp/r5n/match_result.jpg
run bench timeout 7200 python bench.py --iters 10
run eval_b1 timeout 5400 python scripts/bench_eval_throughput.py --iters 20
run eval_b4 timeout 5400 python scripts/bench_eval_throughput.py --iters 20 --batch 4
echo "=== $(date -u +%FT%TZ) bench_driver_timed (fresh process)"
( time ( python bench.py ) ) > /tmp/r5n/bench_driver_timed.log 2>&1
echo "--- exit=$? tail:"; tail -4 /tmp/r5n/bench_driver_timed.log
echo "DONE r5n $(date -u +%FT%TZ)"
