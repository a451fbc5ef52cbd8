#!/bin/bash
# r5 chain O: (1) verify the bare driver command with the new --iters 10
# default (should hit the warm n=10 graph and print the steady ~0.3385);
# (2) retry the 2c bench whose compile died with a relay HTTP 500 in r5k;
# (3) if the 2c retry fails again, isolate with the backbone knob.
set -u
cd /root/repo
mkdir -p /tmp/r5o
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r5o/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -2 "/tmp/r5o/${name}.log"
}
echo "=== $(date -u +%FT%TZ) bench_driver_bare (fresh process, timed)"
( time ( python bench.py ) ) > /tmp/r5o/bench_driver_bare.log 2>&1
echo "--- exit=$? tail:"; tail -4 /tmp/r5o/bench_driver_bare.log
run bench_2c_retry timeout 7200 python bench.py --iters 10 --recipe outdoor_casmtr_2c
if ! grep -q '"metric"' /tmp/r5o/bench_2c_retry.log; then
    run bench_2c_bb32 timeout 7200 env CASMTR_BACKBONE_BF16=0 \
        python bench.py --iters 10 --recipe outdoor_casmtr_2c
fi
echo "DONE r5o $(date -u +%FT%TZ)"
