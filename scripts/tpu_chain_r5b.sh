#!/bin/bash
# r5 chain B: verify + measure the one-hot selection matmul and the
# precomputed-bias kernel (bias residual reuse + grad_scale folding).
#   1. kernel parity (gate: ALL OK) — new bias-input kernels vs jnp oracle
#   2. selection bench (gather vs onehot vs dense variants)
#   3. bench.py --iters 10 (the step number with both optimizations)
#   4. trace_step.py (fresh attribution)
set -x
cd /root/repo
python scripts/tpu_kernel_parity.py > /tmp/r5b_parity.log 2>&1
grep -q "ALL OK" /tmp/r5b_parity.log || { echo "PARITY FAILED" ; }
python scripts/tpu_select_bench.py > /tmp/r5b_select.log 2>&1
python bench.py --iters 10 > /tmp/r5b_bench.log 2>&1
python scripts/trace_step.py > /tmp/r5b_trace.log 2>&1
echo "DONE r5b"
