#!/bin/bash
# Round-4 first TPU chain: quadtree-kernel exp2/prescale variants.
# Waits for the r4 bench warm legs (one TPU job at a time), then:
#   1. kernel parity + standalone timings, exp2 default (vs PERF.md r3:
#      2.17 ms fwd / 6.56 fwd+bwd at the 88^2 level)
#   2. same with CASMTR_QK_PRESCALE=1 (q pre-scaled, no per-score multiply)
#   3. fresh train-step trace to re-attribute the elementwise glue and the
#      "still-f32 1/8-level tables" claim (PERF.md lever b)
set -u
cd /root/repo
while ! grep -q "leg B end" /tmp/r4/bench_warm.log 2>/dev/null; do
    sleep 60
done
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r4/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -5 "/tmp/r4/${name}.log"
}
rm -rf /tmp/r4/cache_probe
run cache_probe_a timeout 1800 python scripts/tpu_cache_probe.py leg_a
run cache_probe_b timeout 1800 python scripts/tpu_cache_probe.py leg_b
run kparity_exp2 timeout 5400 python scripts/tpu_kernel_parity.py
run kparity_prescale env CASMTR_QK_PRESCALE=1 timeout 5400 \
    python scripts/tpu_kernel_parity.py
run trace_step timeout 5400 python scripts/trace_step.py
echo "R4K CHAIN DONE $(date -u +%FT%TZ)"
