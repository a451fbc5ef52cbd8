#!/bin/bash
# CasMTR-2c outdoor, stage 1: coarse 1/8 matching only (reference
# train_megadepth-2c-stage1.sh; 2c and 4c share the stage-1 trunk).
cd "$(dirname "$0")/../.."
python -m casmtr_tpu.cli.train \
  --model outdoor_casmtr_2c --data megadepth_trainval_704 \
  --run-dir runs/casmtr-2c-stage1 \
  --stage 1 --batch-size 2 --epochs 8 --num-workers 8
