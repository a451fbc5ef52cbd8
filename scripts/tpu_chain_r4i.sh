#!/bin/bash
# Round-4 sixth TPU chain: (a) sift post-process on-device smoke (proves the
# scale-space detector lowers and runs on TPU inside the full eval graph),
# (b) ScanNet-geometry eval throughput refresh with the exp2 kernel,
# (c) one more timed cold-process driver-bench check at the very end.
set -u
cd /root/repo
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r4/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r4/${name}.log"
}
python - <<'PYEOF'
from PIL import Image
import numpy as np
rng = np.random.default_rng(0)
yy, xx = np.mgrid[0:480, 0:640].astype(np.float64)
base = 127 + 60*np.sin(xx/9.0)*np.cos(yy/11.0) + 40*rng.random((480, 640))
for i, shift in enumerate((0, 12)):
    img = np.roll(base, shift, axis=1).clip(0, 255).astype(np.uint8)
    Image.fromarray(np.stack([img]*3, -1)).save(f"/tmp/r4/pair{i}.png")
print("pair written")
PYEOF
run sift_device timeout 5400 python -m casmtr_tpu.cli.match_pair \
    /tmp/r4/pair0.png /tmp/r4/pair1.png --resize 256 --thr 0 \
    --out /tmp/r4/sift_result.jpg \
    --overrides-json '{"loftr": {"coarse2": {"post_config": {"method": "sift"}}}}'
run eval_tp_scannet timeout 5400 python scripts/bench_eval_throughput.py \
    --size 640 --height 480
echo "=== $(date -u +%FT%TZ) bench_cold_timed2 (driver command, fresh process)"
( time ( if [ -f bench.py ]; then python bench.py; else exit 0; fi ) ) \
    > /tmp/r4/bench_cold_timed2.log 2>&1
echo "--- exit=$? tail:"; tail -4 /tmp/r4/bench_cold_timed2.log
echo "R4I CHAIN DONE $(date -u +%FT%TZ)"
