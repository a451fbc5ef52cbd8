#!/bin/bash
# Round-3 second TPU chain, after WCA on-device parity passed and the
# default flipped ON (ops/gather_ops.py): re-bench the flagship with the
# kernel in the graph (fresh 704^2 compile), re-measure eval throughput
# (the kernel also accelerates the eval forward), then the on-device
# training soak (VERDICT r2 #3): fake scenes -> 2 epochs with EMA +
# checkpoints + validation -> resume --reset-lr for 1 more epoch.
set -u
cd /root/repo

run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3d_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3d_${name}.log"
}

run bench_twins_wca timeout 10800 python bench.py --iters 10 --backbone twins
run eval_b1_wca timeout 10800 python scripts/bench_eval_throughput.py --iters 20

python scripts/make_fake_scenes.py /tmp/soak_scenes --scenes 3 --images 8 \
    --pairs 40 --hw 480 640
OV='{"dataset": {"train_data_root": "/tmp/soak_scenes", "train_npz_root": "/tmp/soak_scenes", "train_list_path": "/tmp/soak_scenes/train_list.txt", "val_data_root": "/tmp/soak_scenes", "val_npz_root": "/tmp/soak_scenes", "val_list_path": "/tmp/soak_scenes/val_list.txt"}, "trainer": {"n_samples_per_subset": 50, "ema": true, "steps_range": [0, 100000], "ema_warmup": 50, "canonical_bs": 1, "warmup_step": 20}}'
run soak_a timeout 14400 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/soak_run --epochs 2 --batch-size 1 --num-workers 2 \
    --log-every 10 --max-val-pairs 4 --sanity-val-steps 2 \
    --overrides-json "$OV"
run soak_b timeout 7200 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/soak_run_resumed --epochs 1 --batch-size 1 \
    --num-workers 2 --log-every 10 --max-val-pairs 4 --sanity-val-steps 0 \
    --resume /tmp/soak_run/ckpts --reset-lr \
    --overrides-json "$OV"
echo "R3D CHAIN DONE $(date -u +%FT%TZ)"
