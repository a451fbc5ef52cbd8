#!/bin/bash
# Poll the axon TPU relay; when it answers, run the queued validation
# (scripts/tpu_roundup.sh). Designed to run unattended under nohup.
# Probe = device discovery + one tiny matmul fetched to host, under timeout.
set -u
cd /root/repo
PROBE='
import jax, jax.numpy as jnp
ds = jax.devices()
x = jnp.ones((8, 128), jnp.bfloat16)
v = float((x @ x.T).sum())
print("TPU_OK", ds[0].platform, v)
'
while true; do
    out=$(timeout 180 python -c "$PROBE" 2>&1)
    if echo "$out" | grep -q TPU_OK; then
        echo "$(date -u +%FT%TZ) relay up: $out"
        break
    fi
    echo "$(date -u +%FT%TZ) relay still down"
    sleep 120
done
bash scripts/tpu_roundup.sh
