#!/bin/bash
# ScanNet-1500 evaluation at 640x480 (reference scripts/test_scannet.sh).
cd "$(dirname "$0")/../.."
python -m casmtr_tpu.cli.evaluate \
  --model indoor_casmtr_4c --data scannet_test_1500 \
  --ckpt "${1:?usage: test_scannet.sh <checkpoint>}" \
  --profiler inference
