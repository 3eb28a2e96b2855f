#!/bin/bash
# Third link in the session-3 serialized TPU chain: XLA flag sweep over the
# serving step (benchmarks/exp_xla_flags.py), then a confirming bench run if
# the sweep finds a winner.
# Usage: QUEUE_PID=<pid of queue_b> setsid nohup bash tools/r3_session3_queue_c.sh > /tmp/r3_s3_queue_c.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
QUEUE_PID=${QUEUE_PID:-}

if [ -n "${QUEUE_PID}" ]; then
  while kill -0 "${QUEUE_PID}" 2>/dev/null; do sleep 60; done
fi
echo "=== S3 QUEUE C START $(date -u) ==="

echo "=== stage X: XLA flag sweep $(date -u) ==="
timeout 14400 python benchmarks/exp_xla_flags.py || echo "stage X FAILED"

echo "=== S3 QUEUE C COMPLETE $(date -u) ==="
