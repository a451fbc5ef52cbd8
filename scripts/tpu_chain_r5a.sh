#!/bin/bash
# r5 chain A: verify the selection refactor on device, re-baseline the step.
#   1. kernel parity (gate: ALL OK) — exercises the refactored split-top-k
#      selection path vs the jnp oracle at 704^2 geometries
#   2. bench.py --iters 10 (step number after the quadtree.py refactor)
#   3. trace_step.py (fresh per-source attribution for the r5 perf work)
set -x
cd /root/repo
python scripts/tpu_kernel_parity.py > /tmp/r5a_parity.log 2>&1
grep -q "ALL OK" /tmp/r5a_parity.log || { echo "PARITY FAILED" ; }
python bench.py --iters 10 > /tmp/r5a_bench.log 2>&1
python scripts/trace_step.py > /tmp/r5a_trace.log 2>&1
echo "DONE r5a"
