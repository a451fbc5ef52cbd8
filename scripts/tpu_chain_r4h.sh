#!/bin/bash
# Round-4 final TPU chain: warm the DRIVER bench on the final (reverted)
# tree and prove the cold-process run completes in minutes, then re-measure
# the eval throughput rows (b1 restore + the b4 row that died twice on a
# transient relay drop — one retry each).
set -u
cd /root/repo
while ! grep -q "R4G CHAIN DONE" /tmp/r4/chain_r4g.log 2>/dev/null; do
    sleep 60
done
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r4/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r4/${name}.log"
}
run bench_final_warm timeout 5400 python bench.py
echo "=== $(date -u +%FT%TZ) bench_cold_timed (driver command, fresh process)"
( time ( if [ -f bench.py ]; then python bench.py; else exit 0; fi ) ) \
    > /tmp/r4/bench_cold_timed.log 2>&1
echo "--- exit=$? tail:"; tail -4 /tmp/r4/bench_cold_timed.log
run eval_b1_final timeout 5400 python scripts/bench_eval_throughput.py
if ! grep -q "pairs_per_s" /tmp/r4/eval_b1_final.log; then
    run eval_b1_final timeout 5400 python scripts/bench_eval_throughput.py
fi
run eval_b4_final timeout 5400 python scripts/bench_eval_throughput.py --batch 4
if ! grep -q "pairs_per_s" /tmp/r4/eval_b4_final.log; then
    run eval_b4_final timeout 5400 python scripts/bench_eval_throughput.py --batch 4
fi
echo "R4H CHAIN DONE $(date -u +%FT%TZ)"
