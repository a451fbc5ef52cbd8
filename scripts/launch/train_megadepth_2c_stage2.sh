#!/bin/bash
# CasMTR-2c outdoor, stage 3 adds the 1/2 cascade (reference
# train_megadepth-2c-stage2.sh).
cd "$(dirname "$0")/../.."
python -m casmtr_tpu.cli.train \
  --model outdoor_casmtr_2c --data megadepth_trainval_704 \
  --run-dir runs/casmtr-2c-stage3 \
  --stage 3 --batch-size 1 --epochs 25 --num-workers 8 \
  --resume runs/casmtr-4c-stage2/ckpts --reset-lr
