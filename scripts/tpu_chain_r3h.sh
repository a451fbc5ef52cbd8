#!/bin/bash
# Round-3 sixth TPU chain: final-code re-warm after the gather mode="clip"
# change (+ optim/loss fixes already in r3g's bench): bench contract,
# eval b1 re-measure, match_pair verify surface, level-2-shape gather bench.
set -u
cd /root/repo

while ! grep -q "R3G CHAIN DONE" /tmp/r3g_chain.log 2>/dev/null; do
    sleep 120
done

run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3h_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3h_${name}.log"
}

run gather_bench_l2 timeout 7200 python scripts/bench_batched_gather.py \
    --iters 30 --lb 676 --k 32
run bench_twins timeout 10800 python bench.py --iters 10 --backbone twins
run eval_b1 timeout 10800 python scripts/bench_eval_throughput.py --iters 20
python - <<'PYEOF'
# synthetic pair for the match_pair verify surface
from PIL import Image, ImageDraw
import numpy as np
rng = np.random.default_rng(0)
img = (rng.random((480, 640)) * 60 + 80).astype(np.uint8)
for _ in range(24):
    y, x, r = rng.integers(40, 440), rng.integers(40, 600), rng.integers(8, 28)
    yy, xx = np.ogrid[:480, :640]
    img[(yy - y) ** 2 + (xx - x) ** 2 < r * r] = rng.integers(120, 255)
Image.fromarray(img).save("/tmp/pair0.png")
sh = np.roll(np.roll(img, 12, 0), 20, 1)
Image.fromarray(sh).save("/tmp/pair1.png")
PYEOF
run match_pair timeout 7200 python -m casmtr_tpu.cli.match_pair \
    /tmp/pair0.png /tmp/pair1.png --resize 384 --thr 0 --out /tmp/mp_result.jpg
echo "R3H CHAIN DONE $(date -u +%FT%TZ)"
