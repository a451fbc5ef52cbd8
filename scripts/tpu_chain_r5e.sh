#!/bin/bash
# r5 chain E (waits for r5d): re-verify + re-bench after the selection
# blk-mapping one-hot fix (the 3.9 ms/layer take_along in the 8c layers).
set -u
cd /root/repo
while ! grep -q "DONE r5d" /tmp/r5d_chain.log 2>/dev/null; do
    sleep 60
done
set -x
python scripts/tpu_kernel_parity.py > /tmp/r5e_parity.log 2>&1
grep -q "ALL OK" /tmp/r5e_parity.log || { echo "PARITY FAILED" ; }
python bench.py --iters 10 > /tmp/r5e_bench.log 2>&1
python scripts/trace_step.py > /tmp/r5e_trace.log 2>&1
echo "DONE r5e"
