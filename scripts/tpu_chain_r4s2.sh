#!/bin/bash
# Round-4 staged-training chain (replaces the wedged tail of r4c).
set -u
cd /root/repo
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r4/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -5 "/tmp/r4/${name}.log"
}
if [ ! -f /tmp/r4/scenes/train_list.txt ]; then
    run make_scenes python scripts/make_fake_scenes.py /tmp/r4/scenes \
        --scenes 3 --images 8 --pairs 24 --hw 480 640
fi
OV='{"dataset": {"train_data_root": "/tmp/r4/scenes", "train_npz_root": "/tmp/r4/scenes", "train_list_path": "/tmp/r4/scenes/train_list.txt", "val_data_root": "/tmp/r4/scenes", "val_npz_root": "/tmp/r4/scenes", "val_list_path": "/tmp/r4/scenes/val_list.txt"}, "trainer": {"n_samples_per_subset": 50, "ema": true, "steps_range": [0, 100000], "ema_warmup": 50, "canonical_bs": 1, "canonical_lr": 1e-4, "warmup_step": 20}}'
run stage1 timeout 10000 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/r4/stage1 --stage 1 --epochs 2 --batch-size 1 \
    --num-workers 3 --log-every 10 --max-val-pairs 2 --sanity-val-steps 0 \
    --overrides-json "$OV"
run stage2 timeout 10000 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/r4/stage2 --stage 2 --epochs 2 --batch-size 1 \
    --num-workers 3 --log-every 10 --max-val-pairs 2 --sanity-val-steps 0 \
    --resume /tmp/r4/stage1/ckpts --reset-lr \
    --overrides-json "$OV"
echo "R4C CHAIN DONE $(date -u +%FT%TZ)"
