#!/bin/bash
# r5 chain G (waits for r5f): flagship bench after the loftr_fine remat
# passthrough fix (~8 ms of pointless recompute when remat=False), + trace.
set -u
cd /root/repo
while ! grep -q "DONE r5f" /tmp/r5f_chain.log 2>/dev/null; do
    sleep 60
done
set -x
python bench.py --iters 10 > /tmp/r5g_bench.log 2>&1
python scripts/trace_step.py > /tmp/r5g_trace.log 2>&1
echo "DONE r5g"
