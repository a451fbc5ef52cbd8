#!/bin/bash
# Round-4 fifth TPU chain: device A/B of the masked-dense split-top-k
# selection (default) vs the candidate-gather selection it replaced, via
# the kernel-parity script's split section, then a fresh step trace.
set -u
cd /root/repo
while ! grep -q "R4F CHAIN DONE" /tmp/r4/chain_r4f.log 2>/dev/null; do
    sleep 60
done
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r4/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -5 "/tmp/r4/${name}.log"
}
run kparity_dense timeout 5400 python scripts/tpu_kernel_parity.py
run kparity_gather timeout 5400 \
    python scripts/tpu_kernel_parity.py
run trace_step2 timeout 5400 python scripts/trace_step.py
echo "R4G CHAIN DONE $(date -u +%FT%TZ)"
