#!/bin/bash
# Follow-on to r3_session3_queue.sh — waits for it, then runs the remaining
# round-3 evidence measurements:
#   G2. eval wall-clock (streaming engine test path before/after — VERDICT 7)
#   G3. int8 reprobe on the current toolchain (VERDICT 1 receipts)
# Usage: QUEUE_PID=<pid> setsid nohup bash tools/r3_session3_queue_b.sh > /tmp/r3_s3_queue_b.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
QUEUE_PID=${QUEUE_PID:-}

if [ -n "${QUEUE_PID}" ]; then
  while kill -0 "${QUEUE_PID}" 2>/dev/null; do sleep 60; done
fi
echo "=== S3 QUEUE B START $(date -u) ==="

echo "=== stage G2: eval wall-clock $(date -u) ==="
timeout 3600 python benchmarks/eval_wallclock.py --n 128 --batch 32 \
  || echo "stage G2 FAILED"

echo "=== stage G3: int8 reprobe $(date -u) ==="
timeout 2400 python benchmarks/exp_int8_reprobe.py || echo "stage G3 FAILED"

echo "=== S3 QUEUE B COMPLETE $(date -u) ==="
