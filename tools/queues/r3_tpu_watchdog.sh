#!/bin/bash
# Probe the axon TPU tunnel every 5 minutes; when it heals, run the
# stage-A benches then the TPU queue (longrun/perceptual/classifier —
# stage B skipped: the CPU parity chain owns the reduced-scale tasks).
#   nohup bash tools/r3_tpu_watchdog.sh > /tmp/r3_watchdog.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

while true; do
  echo "=== probe $(date) ==="
  if timeout 420 python -c "
import jax, jax.numpy as jnp
x = float(jnp.zeros(()) + 1.0)
print('TPU OK', x, jax.devices())
"; then
    echo "=== TUNNEL UP $(date) ==="
    break
  fi
  echo "=== tunnel still down $(date) ==="
  sleep 300
done

bash benchmarks/r3_stage_a.sh
R3_SKIP_B=1 bash tools/r3_tpu_queue.sh
echo "=== WATCHDOG SEQUENCE COMPLETE $(date) ==="
