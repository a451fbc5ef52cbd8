#!/bin/bash
# r5 chain L (waits for r5j): confirm the transformer-bf16 A/B before
# choosing the shipped default. r5j measured full-bf16 0.3423 vs
# backbone-only (CASMTR_TRANSFORMER_BF16=0) 0.3385 — repeat both,
# alternating, on warm caches to separate signal from drift.
set -u
cd /root/repo
while ! grep -q "DONE r5j" /tmp/r5j_chain.log 2>/dev/null; do
    sleep 30
done
mkdir -p /tmp/r5l
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r5l/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -2 "/tmp/r5l/${name}.log"
}
run bench_full_a timeout 3600 python bench.py --iters 10
run bench_tf32_a timeout 3600 env CASMTR_TRANSFORMER_BF16=0 python bench.py --iters 10
run bench_full_b timeout 3600 python bench.py --iters 10
run bench_tf32_b timeout 3600 env CASMTR_TRANSFORMER_BF16=0 python bench.py --iters 10
echo "DONE r5l $(date -u +%FT%TZ)"
