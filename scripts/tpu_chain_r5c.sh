#!/bin/bash
# r5 chain C (waits for r5b): staged training at PRODUCTION supervision
# density on geometrically-consistent synthetic scenes (VERDICT r5 #4), then
# the indoor recipe's first-ever on-device staged smoke (VERDICT r5 #6).
set -u
cd /root/repo
while ! grep -q "DONE r5b" /tmp/r5b_chain.log 2>/dev/null; do
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
if [ ! -f /tmp/r5/scenes/train_list.txt ]; then
    run make_scenes python scripts/make_fake_scenes.py /tmp/r5/scenes \
        --scenes 3 --images 10 --pairs 40 --hw 480 640
fi
OV='{"dataset": {"train_data_root": "/tmp/r5/scenes", "train_npz_root": "/tmp/r5/scenes", "train_list_path": "/tmp/r5/scenes/train_list.txt", "val_data_root": "/tmp/r5/scenes", "val_npz_root": "/tmp/r5/scenes", "val_list_path": "/tmp/r5/scenes/val_list.txt"}, "trainer": {"n_samples_per_subset": 60, "ema": true, "steps_range": [0, 100000], "ema_warmup": 100, "canonical_bs": 1, "canonical_lr": 1e-4, "warmup_step": 30}}'
run stage1 timeout 10000 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/r5/stage1 --stage 1 --epochs 5 --batch-size 1 \
    --num-workers 3 --log-every 10 --max-val-pairs 6 --sanity-val-steps 0 \
    --overrides-json "$OV"
run stage2 timeout 10000 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/r5/stage2 --stage 2 --epochs 5 --batch-size 1 \
    --num-workers 3 --log-every 10 --max-val-pairs 6 --sanity-val-steps 0 \
    --resume /tmp/r5/stage1/ckpts --reset-lr \
    --overrides-json "$OV"
# indoor recipe (ResNet + POLA + relative PE) first on-device staged smoke
OVI='{"dataset": {"train_data_root": "/tmp/r5/scenes", "train_npz_root": "/tmp/r5/scenes", "train_list_path": "/tmp/r5/scenes/train_list.txt", "val_data_root": "/tmp/r5/scenes", "val_npz_root": "/tmp/r5/scenes", "val_list_path": "/tmp/r5/scenes/val_list.txt", "mgdpt_img_resize": 640, "mgdpt_df": 32}, "trainer": {"n_samples_per_subset": 25, "ema": false, "steps_range": [0, 100000], "canonical_bs": 1, "canonical_lr": 1e-4, "warmup_step": 10}}'
run indoor1 timeout 10000 python -m casmtr_tpu.cli.train \
    --model indoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/r5/indoor1 --stage 1 --epochs 1 --batch-size 1 \
    --num-workers 3 --log-every 5 --max-val-pairs 2 --sanity-val-steps 0 \
    --overrides-json "$OVI"
run indoor2 timeout 10000 python -m casmtr_tpu.cli.train \
    --model indoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/r5/indoor2 --stage 2 --epochs 1 --batch-size 1 \
    --num-workers 3 --log-every 5 --max-val-pairs 2 --sanity-val-steps 0 \
    --resume /tmp/r5/indoor1/ckpts --reset-lr \
    --overrides-json "$OVI"
echo "DONE r5c"
