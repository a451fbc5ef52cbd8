#!/bin/bash
# Round-3 thirteenth TPU chain: demonstrate the CLI persistent-compile-cache
# fix — leg A compiles the 704^2 train graph and persists it to .jax_cache;
# leg B (identical config, fresh process) must reach its first step in
# minutes instead of ~40-75 min.
set -u
cd /root/repo
while ! grep -q "R3N CHAIN DONE" /tmp/r3n_chain.log 2>/dev/null; do
    sleep 60
done
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3o_${name}.log" 2>&1
    echo "--- exit=$? tail at $(date -u +%FT%TZ):"
    tail -3 "/tmp/r3o_${name}.log"
}
OV='{"dataset": {"train_data_root": "/tmp/soak_scenes2", "train_npz_root": "/tmp/soak_scenes2", "train_list_path": "/tmp/soak_scenes2/train_list.txt", "val_data_root": "/tmp/soak_scenes2", "val_npz_root": "/tmp/soak_scenes2", "val_list_path": "/tmp/soak_scenes2/val_list.txt"}, "trainer": {"n_samples_per_subset": 20, "ema": true, "steps_range": [0, 100000], "ema_warmup": 50, "canonical_bs": 1, "canonical_lr": 1e-4, "warmup_step": 20}}'
run cache_leg_a timeout 10800 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/soak_run5a --epochs 1 --batch-size 1 --num-workers 3 \
    --log-every 10 --max-val-pairs 2 --sanity-val-steps 0 \
    --overrides-json "$OV"
run cache_leg_b timeout 10800 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/soak_run5b --epochs 1 --batch-size 1 --num-workers 3 \
    --log-every 10 --max-val-pairs 2 --sanity-val-steps 0 \
    --overrides-json "$OV"
echo "R3O CHAIN DONE $(date -u +%FT%TZ)"
