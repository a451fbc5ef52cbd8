#!/bin/bash
# Round-3 ninth TPU chain: the soak at a sane per-sample lr (the r3g soak
# used canonical_bs=1 => lr 8e-3 at bs=1, 64x the reference's per-sample
# rate: one step collapses the T=0.1 dual-softmax to the 1e-6 conf clip
# floor where the (reference-identical) clamp zeroes gradients). Graph is
# compile-cached from r3g. Then a resume+reset-lr leg on device.
set -u
cd /root/repo

while ! grep -q "R3J CHAIN DONE" /tmp/r3j_chain.log 2>/dev/null; do
    sleep 120
done

run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3k_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3k_${name}.log"
}

OV='{"dataset": {"train_data_root": "/tmp/soak_scenes2", "train_npz_root": "/tmp/soak_scenes2", "train_list_path": "/tmp/soak_scenes2/train_list.txt", "val_data_root": "/tmp/soak_scenes2", "val_npz_root": "/tmp/soak_scenes2", "val_list_path": "/tmp/soak_scenes2/val_list.txt"}, "trainer": {"n_samples_per_subset": 50, "ema": true, "steps_range": [0, 100000], "ema_warmup": 50, "canonical_bs": 1, "canonical_lr": 1e-4, "warmup_step": 20}}'
run soak_lr timeout 14400 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/soak_run3 --epochs 2 --batch-size 1 --num-workers 2 \
    --log-every 10 --max-val-pairs 4 --sanity-val-steps 0 \
    --overrides-json "$OV"
run soak_resume timeout 7200 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/soak_run3_resumed --epochs 1 --batch-size 1 \
    --num-workers 2 --log-every 10 --max-val-pairs 4 --sanity-val-steps 0 \
    --resume /tmp/soak_run3/ckpts --reset-lr \
    --overrides-json "$OV"
echo "R3K CHAIN DONE $(date -u +%FT%TZ)"
