#!/bin/bash
# Follow-up to tpu_roundup.sh after the Mosaic-safe WCA helper rewrite:
# wait for the roundup queue to drain, then validate the fixed WCA kernel
# on device and bench the train step with it enabled.
set -u
cd /root/repo

while ! grep -q "ALL DONE" /tmp/roundup_main.log 2>/dev/null; do
    sleep 20
done

echo "=== wca parity (fixed kernel) ==="
python scripts/tpu_kernel_parity.py --only wca > /tmp/wca_parity.log 2>&1
echo "--- exit=$? tail:"
tail -8 /tmp/wca_parity.log

echo "=== bench twins + WCA kernel ==="
env CASMTR_PALLAS_WINDOW_CROSS=1 python bench.py --iters 10 --backbone twins \
    > /tmp/wca_bench.log 2>&1
echo "--- exit=$? tail:"
tail -2 /tmp/wca_bench.log
echo "WCA FOLLOWUP DONE"
