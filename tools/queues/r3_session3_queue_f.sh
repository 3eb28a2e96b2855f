#!/bin/bash
# Sixth link in the session-3 serialized TPU chain: the stage-I parity seed
# reruns queue A skipped (it executed a stale pre-fix copy of its own
# script's workdir check).
# Usage: QUEUE_PID=<pid of queue_e> setsid nohup bash tools/r3_session3_queue_f.sh > /tmp/r3_s3_queue_f.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
QUEUE_PID=${QUEUE_PID:-}

if [ -n "${QUEUE_PID}" ]; then
  while kill -0 "${QUEUE_PID}" 2>/dev/null; do sleep 60; done
fi
echo "=== S3 QUEUE F START $(date -u) ==="

for task in pixelation_easy high_light; do
  if [ -f /tmp/parity_r3/${task}/${task}_parity.json ] && [ ! -f /tmp/parity_r3/${task}/seed_rerun.json ]; then
    echo "=== stage I2: ${task} seed rerun $(date -u) ==="
    timeout 7200 python tools/parity/seed_rerun.py \
      --workdir /tmp/parity_r3/${task} --task ${task} --seeds 1337,2024 \
      || echo "stage I2 ${task} FAILED"
    bash tools/parity/snapshot_r3.sh || true
  else
    echo "=== stage I2: ${task} skipped ==="
  fi
done

echo "=== S3 QUEUE F COMPLETE $(date -u) ==="
