#!/bin/bash
# Seventh link in the session-3 serialized TPU chain: the int8 reprobe
# (fixed block indexing) and a final tuned headline bench on an idle host.
# Usage: QUEUE_PID=<pid of queue_f> setsid nohup bash tools/r3_session3_queue_g.sh > /tmp/r3_s3_queue_g.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
QUEUE_PID=${QUEUE_PID:-}

if [ -n "${QUEUE_PID}" ]; then
  while kill -0 "${QUEUE_PID}" 2>/dev/null; do sleep 60; done
fi
echo "=== S3 QUEUE G START $(date -u) ==="

echo "=== stage G3b: int8 reprobe (fixed) $(date -u) ==="
timeout 2400 python benchmarks/exp_int8_reprobe.py || echo "stage G3b FAILED"

echo "=== stage H: final headline bench (idle host) $(date -u) ==="
timeout 2400 python bench.py || echo "stage H FAILED"

echo "=== S3 QUEUE G COMPLETE $(date -u) ==="
