#!/bin/bash
# Fifth link in the session-3 serialized TPU chain: training-precision A/B
# (bf16 vs fp32) on the round-3 losing tasks — the missing control variable
# between the round-2 (CPU fp32, all wins) and round-3 (TPU bf16, mixed)
# parity programs.  color_distortion first (largest deficit), then
# high_light and motion_blur as the window allows.
# Usage: QUEUE_PID=<pid of queue_d> setsid nohup bash tools/r3_session3_queue_e.sh > /tmp/r3_s3_queue_e.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
QUEUE_PID=${QUEUE_PID:-}

if [ -n "${QUEUE_PID}" ]; then
  while kill -0 "${QUEUE_PID}" 2>/dev/null; do sleep 60; done
fi
echo "=== S3 QUEUE E START $(date -u) ==="

for task in color_distortion high_light motion_blur; do
  if [ ! -f /tmp/parity_r3/${task}/${task}_parity.json ]; then
    echo "=== stage P: ${task} data missing, generating $(date -u) ==="
    timeout 1200 python tools/parity/run_parity.py \
      --workdir /tmp/parity_r3/${task} --task ${task} \
      --epochs 30 --batch 4 --height 128 --width 192 --stage data \
      || { echo "data gen FAILED for ${task}"; continue; }
  fi
  if [ ! -f tools/parity/results_r3/${task}_precision_ab.json ]; then
    echo "=== stage P: ${task} precision A/B $(date -u) ==="
    timeout 7200 python tools/parity/precision_ab.py \
      --workdir /tmp/parity_r3/${task} --task ${task} \
      || echo "stage P ${task} FAILED"
  fi
done

echo "=== S3 QUEUE E COMPLETE $(date -u) ==="
