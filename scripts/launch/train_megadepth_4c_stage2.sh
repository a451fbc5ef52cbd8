#!/bin/bash
# CasMTR-4c outdoor, stage 2 (+cascade/fine), resuming the stage-1 checkpoint
# non-strictly (new modules init fresh; reference train_megadepth-4c-stage2.sh
# --resume_from_checkpoint --reset_lr, 25 epochs).
cd "$(dirname "$0")/../.."
python -m casmtr_tpu.cli.train \
  --model outdoor_casmtr_4c --data megadepth_trainval_704 \
  --run-dir runs/casmtr-4c-stage2 \
  --stage 2 --batch-size 2 --epochs 25 --num-workers 8 \
  --resume runs/casmtr-4c-stage1/ckpts --reset-lr
