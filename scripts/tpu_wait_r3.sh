#!/bin/bash
# Poll the axon TPU relay; when a tiny matmul round-trips, run the round-3
# chain (scripts/tpu_chain_r3.sh). Unattended under nohup.
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
    out=$(timeout 240 python -c "$PROBE" 2>&1)
    if echo "$out" | grep -q TPU_OK; then
        echo "$(date -u +%FT%TZ) relay up: $(echo "$out" | grep TPU_OK)"
        break
    fi
    echo "$(date -u +%FT%TZ) relay still down"
    sleep 120
done
bash scripts/tpu_chain_r3.sh
