#!/bin/bash
# r5 chain M: eval-side A/B for the transformer-bf16 default (train side
# measured in r5l: OFF is ~3-4 ms/step faster). Eval b1 with the
# transformer stack f32 (new graph) vs the cached full-bf16 graph.
set -u
cd /root/repo
mkdir -p /tmp/r5m
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r5m/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -2 "/tmp/r5m/${name}.log"
}
run eval_b1_tf32 timeout 5400 env CASMTR_TRANSFORMER_BF16=0 \
    python scripts/bench_eval_throughput.py --iters 20
run eval_b1_full timeout 5400 python scripts/bench_eval_throughput.py --iters 20
run eval_b4_tf32 timeout 5400 env CASMTR_TRANSFORMER_BF16=0 \
    python scripts/bench_eval_throughput.py --iters 20 --batch 4
echo "DONE r5m $(date -u +%FT%TZ)"
