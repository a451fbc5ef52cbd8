#!/bin/bash
# Round-3 twelfth TPU chain: 1-epoch soak re-run with the data_s/step_s
# split timing (host-side change only — the train graph is cache-warm),
# 3 loader workers to probe the loader-bound ceiling on this 4-core host.
set -u
cd /root/repo
while ! grep -q "R3M CHAIN DONE" /tmp/r3m_chain.log 2>/dev/null; do
    sleep 60
done
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r3n_${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -3 "/tmp/r3n_${name}.log"
}
OV='{"dataset": {"train_data_root": "/tmp/soak_scenes2", "train_npz_root": "/tmp/soak_scenes2", "train_list_path": "/tmp/soak_scenes2/train_list.txt", "val_data_root": "/tmp/soak_scenes2", "val_npz_root": "/tmp/soak_scenes2", "val_list_path": "/tmp/soak_scenes2/val_list.txt"}, "trainer": {"n_samples_per_subset": 50, "ema": true, "steps_range": [0, 100000], "ema_warmup": 50, "canonical_bs": 1, "canonical_lr": 1e-4, "warmup_step": 20}}'
run soak_timed timeout 7200 python -m casmtr_tpu.cli.train \
    --model outdoor_casmtr_4c --data megadepth_trainval_704 \
    --run-dir /tmp/soak_run4 --epochs 1 --batch-size 1 --num-workers 3 \
    --log-every 10 --max-val-pairs 2 --sanity-val-steps 0 \
    --overrides-json "$OV"
echo "R3N CHAIN DONE $(date -u +%FT%TZ)"
