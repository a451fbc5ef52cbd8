#!/bin/bash
# MegaDepth-1500 evaluation at long-edge 832 (reference
# scripts/test_megadepth-4c.sh).
cd "$(dirname "$0")/../.."
python -m casmtr_tpu.cli.evaluate \
  --model outdoor_casmtr_4c --data megadepth_test_1500 \
  --ckpt "${1:?usage: test_megadepth_4c.sh <checkpoint>}" \
  --profiler inference
