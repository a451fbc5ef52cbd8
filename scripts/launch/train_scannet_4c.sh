#!/bin/bash
# CasMTR-4c indoor PMT refine (reference scripts/train_scannet-4c.sh).
cd "$(dirname "$0")/../.."
python -m casmtr_tpu.cli.train \
  --model indoor_casmtr_4c --data scannet_trainval \
  --run-dir runs/casmtr-4c-indoor \
  --stage 2 --batch-size 2 --epochs 4 --num-workers 8
