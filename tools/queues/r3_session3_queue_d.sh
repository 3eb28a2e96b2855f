#!/bin/bash
# Fourth link in the session-3 serialized TPU chain: the trainable fused
# DenseBlock on real hardware — numeric check first (Mosaic lowering +
# bf16-class gradient agreement, tools/check_growth_tpu.py), then the
# training-step tables the queue-A stage F runs missed (they imported the
# pre-fix module and failed to lower).
# Usage: QUEUE_PID=<pid of queue_c> setsid nohup bash tools/r3_session3_queue_d.sh > /tmp/r3_s3_queue_d.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
QUEUE_PID=${QUEUE_PID:-}

if [ -n "${QUEUE_PID}" ]; then
  while kill -0 "${QUEUE_PID}" 2>/dev/null; do sleep 60; done
fi
echo "=== S3 QUEUE D START $(date -u) ==="

echo "=== stage F2a: on-TPU fused-gradient check $(date -u) ==="
timeout 3000 python tools/check_growth_tpu.py || echo "stage F2a FAILED"

echo "=== stage F2b: fused training tables (post-fix) $(date -u) ==="
timeout 5400 python benchmarks/profile_train.py --only \
"train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage F2b base FAILED"
timeout 5400 python benchmarks/profile_train.py --k-stack 48 --only \
"train step (fused DenseBlocks)" || echo "stage F2b k-stack FAILED"
timeout 5400 python benchmarks/profile_train.py --batch 128 --height 256 --width 256 --only \
"train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage F2b b128 FAILED"
timeout 5400 python benchmarks/profile_train.py --batch 256 --height 256 --width 256 --only \
"train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage F2b b256 probe failed (OOM is an acceptable answer)"

echo "=== S3 QUEUE D COMPLETE $(date -u) ==="
