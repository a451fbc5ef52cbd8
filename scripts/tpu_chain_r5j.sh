#!/bin/bash
# Round-5 chain J: verify + measure the bf16 compute policy (backbone +
# transformer stacks, CASMTR_BACKBONE_BF16 / CASMTR_TRANSFORMER_BF16,
# default-on on TPU).
#   1. match_pair CLI at 384 (full eval graph on device, thr 0 -> nonzero
#      match count expected with random init)
#   2. bench.py (flagship 704^2 train step, the driver metric)
#   3. trace_step.py (budget attribution at the new step time)
#   4. eval throughput b1 + b4 at the MegaDepth-1500 geometry
#   5. A/B leg: CASMTR_TRANSFORMER_BF16=0 bench.py (isolates the backbone
#      contribution; backbone knob stays default-on)
#   6. timed fresh-process driver-command check (warm-cache discipline)
set -u
cd /root/repo
mkdir -p /tmp/r5j
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r5j/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r5j/${name}.log"
}
python - <<'PYEOF'
from PIL import Image
import numpy as np
rng = np.random.default_rng(0)
yy, xx = np.mgrid[0:480, 0:640].astype(np.float64)
base = 127 + 60*np.sin(xx/9.0)*np.cos(yy/11.0) + 40*rng.random((480, 640))
for i, shift in enumerate((0, 12)):
    img = np.roll(base, shift, axis=1).clip(0, 255).astype(np.uint8)
    Image.fromarray(np.stack([img]*3, -1)).save(f"/tmp/r5j/pair{i}.png")
print("pair written")
PYEOF
run match_pair timeout 5400 python -m casmtr_tpu.cli.match_pair \
    /tmp/r5j/pair0.png /tmp/r5j/pair1.png --resize 384 --thr 0 \
    --out /tmp/r5j/match_result.jpg
run bench timeout 7200 python bench.py --iters 10
run trace timeout 5400 python scripts/trace_step.py
run eval_b1 timeout 5400 python scripts/bench_eval_throughput.py
run eval_b4 timeout 5400 python scripts/bench_eval_throughput.py --batch 4
run bench_tf32 timeout 7200 env CASMTR_TRANSFORMER_BF16=0 \
    python bench.py --iters 10
echo "=== $(date -u +%FT%TZ) bench_driver_timed (fresh process)"
( time ( python bench.py ) ) > /tmp/r5j/bench_driver_timed.log 2>&1
echo "--- exit=$? tail:"; tail -4 /tmp/r5j/bench_driver_timed.log
echo "DONE r5j $(date -u +%FT%TZ)"
