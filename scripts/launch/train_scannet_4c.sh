#!/bin/bash
# CasMTR-4c indoor PMT refine at 640 (reference scripts/train_scannet-4c.sh:
# 4 devices x batch 4, 30 epochs, --refine with a pretrained quadtree trunk;
# LR auto-scales with global batch).
cd "$(dirname "$0")/../.."
python -m casmtr_tpu.cli.train \
  --model indoor_casmtr_4c --data scannet_trainval \
  --run-dir runs/casmtr-4c-indoor \
  --stage 2 --batch-size 4 --epochs 30 --num-workers 8 \
  --refine \
  --quadtree-ckpt "${1:?usage: train_scannet_4c.sh <pretrained indoor quadtree ckpt>}" \
  --overrides-json '{"loftr": {"train_size": 640}}'
