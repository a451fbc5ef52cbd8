#!/bin/bash
# r5 chain F (waits for r5e): indoor staged smoke with the RUNNABLE dims
# (the published indoor recipe's 196-vs-128 inconsistency crashes stage 2
# on the reference and here alike — indoor_casmtr_4c_runnable is the
# documented consistent assignment).
set -u
cd /root/repo
while ! grep -q "DONE r5e" /tmp/r5e_chain.log 2>/dev/null; do
    sleep 60
done
mkdir -p /tmp/r5
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r5/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -5 "/tmp/r5/${name}.log"
}
OVI='{"dataset": {"train_data_root": "/tmp/r5/scenes", "train_npz_root": "/tmp/r5/scenes", "train_list_path": "/tmp/r5/scenes/train_list.txt", "val_data_root": "/tmp/r5/scenes", "val_npz_root": "/tmp/r5/scenes", "val_list_path": "/tmp/r5/scenes/val_list.txt", "mgdpt_img_resize": 640, "mgdpt_df": 32}, "trainer": {"n_samples_per_subset": 25, "ema": false, "steps_range": [0, 100000], "canonical_bs": 1, "canonical_lr": 1e-4, "warmup_step": 10}}'
run indoor1b timeout 10000 python -m casmtr_tpu.cli.train \
    --model indoor_casmtr_4c_runnable --data megadepth_trainval_704 \
    --run-dir /tmp/r5/indoor1b --stage 1 --epochs 2 --batch-size 1 \
    --num-workers 3 --log-every 5 --max-val-pairs 2 --sanity-val-steps 0 \
    --overrides-json "$OVI"
run indoor2b timeout 10000 python -m casmtr_tpu.cli.train \
    --model indoor_casmtr_4c_runnable --data megadepth_trainval_704 \
    --run-dir /tmp/r5/indoor2b --stage 2 --epochs 2 --batch-size 1 \
    --num-workers 3 --log-every 5 --max-val-pairs 2 --sanity-val-steps 0 \
    --resume /tmp/r5/indoor1b/ckpts --reset-lr \
    --overrides-json "$OVI"
echo "DONE r5f"
