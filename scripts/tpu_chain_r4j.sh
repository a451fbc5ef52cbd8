#!/bin/bash
# Round-4 seventh TPU chain: (a) stage-2 CONTINUATION (3 more epochs,
# resuming the r4 stage-2 run) for a longer cascade/fine loss curve,
# (b) the PMT refine model training on device for the first time (frozen
# trunk from the stage-2 checkpoint + refine stages), 1 epoch.
set -u
cd /root/repo
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r4/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -5 "/tmp/r4/${name}.log"
}
OV='{"dataset": {"train_data_root": "/tmp/r4/scenes", "train_npz_root": "/tmp/r4/scenes", "train_list_path": "/tmp/r4/scenes/train_list.txt", "val_data_root": "/tmp/r4/scenes", "val_npz_root": "/tmp/r4/scenes", "val_list_path": "/tmp/r4/scenes/val_list.txt"}, "trainer": {"n_samples_per_subset": 50, "ema": true, "steps_range": [0, 100000], "ema_warmup": 50, "canonical_bs": 1, "canonical_lr": 1e-4, "warmup_step": 20}}'
run stage2_cont timeout 10000 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/r4/stage2 --stage 2 --epochs 5 --batch-size 1 \
    --num-workers 3 --log-every 10 --max-val-pairs 2 --sanity-val-steps 0 \
    --resume /tmp/r4/stage2/ckpts \
    --overrides-json "$OV"
run refine_train timeout 10000 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/r4/refine --refine --quadtree-ckpt /tmp/r4/stage2/ckpts \
    --epochs 1 --batch-size 1 --num-workers 3 --log-every 10 \
    --max-val-pairs 2 --sanity-val-steps 0 \
    --overrides-json "$OV"
echo "R4J CHAIN DONE $(date -u +%FT%TZ)"
