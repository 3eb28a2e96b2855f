#!/bin/bash
# Round-3 TPU watchdog, v2 — deadline-aware.  Probes the axon tunnel every
# 5 minutes; on heal, runs only the stages that FIT before the round-end
# deadline (the driver runs bench.py on the chip at round end; a TPU stage
# still running then would corrupt those numbers — serialize by stopping
# early).  Stage value order under a short window:
#   A. serving variant sweep (feeds config/serving_tuning.json -> bench)
#   G. headline bench + eval wall-clock for the record
#   F. training-step tables
#   D/C/E. perceptual A/B, longrun, classifier (only with a long window)
# Usage: DEADLINE_UTC="13:00" nohup bash tools/r3_tpu_watchdog2.sh > /tmp/r3_watchdog2.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
DEADLINE_UTC=${DEADLINE_UTC:-12:50}

now_s()      { date -u +%s; }
deadline_s() { date -u -d "today ${DEADLINE_UTC}" +%s; }
mins_left()  { echo $(( ($(deadline_s) - $(now_s)) / 60 )); }

while true; do
  echo "=== probe $(date -u) (${DEADLINE_UTC}Z deadline, $(mins_left) min left) ==="
  if [ "$(mins_left)" -lt 20 ]; then
    echo "=== deadline reached without a heal; exiting $(date -u) ==="
    exit 0
  fi
  if timeout 420 python -c "
import jax, jax.numpy as jnp
x = float(jnp.zeros(()) + 1.0)
print('TPU OK', x, jax.devices())
"; then
    echo "=== TUNNEL UP $(date -u) ==="
    break
  fi
  echo "=== tunnel still down $(date -u) ==="
  sleep 300
done

M=$(mins_left)
echo "=== heal with ${M} min to deadline ==="

if [ "$M" -ge 50 ]; then
  # Stage A, bounded by the remaining window minus a bench reserve.
  BUDGET=$(( (M - 30) * 60 ))
  [ "$BUDGET" -gt 10800 ] && BUDGET=10800
  echo "=== stage A (budget ${BUDGET}s) $(date -u) ==="
  timeout "$BUDGET" python benchmarks/tune_serving.py || echo "stage A incomplete"
fi

M=$(mins_left)
if [ "$M" -ge 25 ]; then
  echo "=== stage G bench $(date -u) ==="
  timeout $(( (M - 10) * 60 )) python bench.py || echo "bench FAILED"
fi

M=$(mins_left)
if [ "$M" -ge 90 ]; then
  echo "=== long window: handing off to the full queue $(date -u) ==="
  bash tools/r3_tpu_queue.sh
fi
echo "=== WATCHDOG v2 SEQUENCE COMPLETE $(date -u) ==="
