#!/bin/bash
# CasMTR-4c outdoor, stage 1 (coarse only), 704^2, the canonical recipe
# (reference scripts/train_megadepth-4c-stage1.sh: 4 devices x batch 2,
#  8 epochs, fp16 -> here bf16-on-TPU; LR auto-scales with global batch).
cd "$(dirname "$0")/../.."
python -m casmtr_tpu.cli.train \
  --model outdoor_casmtr_4c --data megadepth_trainval_704 \
  --run-dir runs/casmtr-4c-stage1 \
  --stage 1 --batch-size 2 --epochs 8 --num-workers 8
