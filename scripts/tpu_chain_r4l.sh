#!/bin/bash
# Round-4 ninth TPU chain: quadtree-LoFTR baseline recipe train-step bench
# (bench.py now routes recipes through build_model).
set -u
cd /root/repo
while ! grep -q "R4K2 CHAIN DONE" /tmp/r4/chain_r4k2.log 2>/dev/null; do
    sleep 60
done
echo "=== $(date -u +%FT%TZ) bench_quadtree2"
timeout 5400 python bench.py --recipe quadtree_baseline \
    > /tmp/r4/bench_quadtree2.log 2>&1
echo "--- exit=$? tail:"; tail -3 /tmp/r4/bench_quadtree2.log
echo "R4L CHAIN DONE $(date -u +%FT%TZ)"
