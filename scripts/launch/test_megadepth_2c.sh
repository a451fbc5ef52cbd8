#!/bin/bash
# MegaDepth-1500 evaluation of CasMTR-2c at long-edge 832 (reference
# scripts/test_megadepth-2c.sh).
cd "$(dirname "$0")/../.."
python -m casmtr_tpu.cli.evaluate \
  --model outdoor_casmtr_2c --data megadepth_test_1500 \
  --ckpt "${1:?usage: test_megadepth_2c.sh <checkpoint>}" \
  --profiler inference
