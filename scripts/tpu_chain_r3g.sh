#!/bin/bash
# Round-3 fifth TPU chain: verify the optim (global-norm clip) + loss
# (empty-valid NaN-grad) fixes on device and close the batched-gather
# question. Waits for the r3f eval chain.
set -u
cd /root/repo

while ! grep -q "R3F CHAIN DONE" /tmp/r3f_chain.log 2>/dev/null; do
    sleep 120
done

run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3g_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3g_${name}.log"
}

# 1. batched-gather lowering experiment (small graphs)
run gather_bench timeout 7200 python scripts/bench_batched_gather.py --iters 30

# 2. bench re-warm: optim+loss changes invalidated the train-step graph
run bench_twins timeout 10800 python bench.py --iters 10 --backbone twins

# 3. kernel parity (unchanged kernels -> cached; fast confirmation)
run kernel_parity timeout 10800 python scripts/tpu_kernel_parity.py

# 4. post-NaN-fix soak: grad_norm must be finite, loss_8c must MOVE
python scripts/make_fake_scenes.py /tmp/soak_scenes2 --scenes 3 --images 8 \
    --pairs 40 --hw 480 640
OV='{"dataset": {"train_data_root": "/tmp/soak_scenes2", "train_npz_root": "/tmp/soak_scenes2", "train_list_path": "/tmp/soak_scenes2/train_list.txt", "val_data_root": "/tmp/soak_scenes2", "val_npz_root": "/tmp/soak_scenes2", "val_list_path": "/tmp/soak_scenes2/val_list.txt"}, "trainer": {"n_samples_per_subset": 50, "ema": true, "steps_range": [0, 100000], "ema_warmup": 50, "canonical_bs": 1, "warmup_step": 20}}'
run soak_fixed timeout 14400 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/soak_run2 --epochs 2 --batch-size 1 --num-workers 2 \
    --log-every 10 --max-val-pairs 4 --sanity-val-steps 2 \
    --overrides-json "$OV"
echo "R3G CHAIN DONE $(date -u +%FT%TZ)"
