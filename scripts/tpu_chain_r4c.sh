#!/bin/bash
# Round-4 cache-key forensics + staged-training queue (runs after r4k).
#   1-2. bench.py with cache-key component DEBUG logging, killed right
#        after the big-graph cache lookup is logged (the key is computed
#        BEFORE compiling, so no 30-min wait) — run twice, diff the
#        per-component hashes to find which key component is unstable
#        across processes under axon.
#   3+. the staged-training legs (previously tpu_chain_r4s.sh).
set -u
cd /root/repo
while ! grep -q "R4K CHAIN DONE" /tmp/r4/chain_r4k.log 2>/dev/null; do
    sleep 60
done
run() {
    name=$1; shift
    echo "=== $(date -u +%FT%TZ) $name: $* ==="
    ( "$@" ) > "/tmp/r4/${name}.log" 2>&1
    echo "--- exit=$? tail:"
    tail -5 "/tmp/r4/${name}.log"
}
for leg in a b; do
    echo "=== $(date -u +%FT%TZ) benchkey_$leg ==="
    JAX_DEBUG_LOG_MODULES=jax._src.cache_key,jax._src.lru_cache,jax._src.compilation_cache \
        timeout 1500 python bench.py > "/tmp/r4/benchkey_${leg}.log" 2>&1 &
    BP=$!
    # kill as soon as the big graph's key lookup is logged (it is the last
    # lookup before the long compile)
    for i in $(seq 1 1500); do
        if grep -q "key: 'jit__unknown" "/tmp/r4/benchkey_${leg}.log"; then
            sleep 5; kill $BP 2>/dev/null; break
        fi
        sleep 2
    done
    wait $BP 2>/dev/null
    echo "--- benchkey_$leg done (unknown-lookup found: $(grep -c "jit__unknown" /tmp/r4/benchkey_${leg}.log))"
done
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
