#!/bin/bash
# r5 chain P: the 2c 704^2 train graph is 16 MB over the 15.75G HBM cap
# with the default policy (f32 transformer stack in train). Two candidate
# cures, cheapest first: bf16 stack (saves fwd residual bytes, ~1% step
# cost on 4c) and remat.
set -u
cd /root/repo
mkdir -p /tmp/r5p
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r5p/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -2 "/tmp/r5p/${name}.log"
}
run bench_2c_bf16stack timeout 7200 env CASMTR_TRANSFORMER_BF16=1 \
    python bench.py --iters 10 --recipe outdoor_casmtr_2c
run bench_2c_remat timeout 7200 \
    python bench.py --iters 10 --recipe outdoor_casmtr_2c --remat
echo "DONE r5p $(date -u +%FT%TZ)"
