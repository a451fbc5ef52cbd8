#!/bin/bash
# r5 chain H (waits for r5g): 200-frame SfM sequence re-run with the new
# map-based pose recovery (PnP vs landmark map + skip-pair composition) —
# gate: zero "trajectory unreliable" warnings, ATE(chain init) < the r4
# 2.02 / final < 0.66.
set -u
cd /root/repo
while ! grep -q "DONE r5g" /tmp/r5g_chain.log 2>/dev/null; do
    sleep 60
done
set -x
timeout 7200 python scripts/sfm_scale_bench.py --big --only bigseq \
    > /tmp/r5h_sfm_bigseq.log 2>&1
tail -3 /tmp/r5h_sfm_bigseq.log
echo "DONE r5h"
