#!/bin/bash
# r5 chain I (waits for r5h): eval b4 + b1 traces with the one-hot
# selection — the SoL attribution for the remaining b4-vs-b1 gap.
set -u
cd /root/repo
while ! grep -q "DONE r5h" /tmp/r5h_chain.log 2>/dev/null; do
    sleep 60
done
set -x
timeout 7200 python scripts/trace_eval.py --batch 4 > /tmp/r5i_trace_b4.log 2>&1
timeout 7200 python scripts/trace_eval.py --batch 1 > /tmp/r5i_trace_b1.log 2>&1
echo "DONE r5i"
