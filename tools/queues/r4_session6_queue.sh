#!/bin/bash
# Round-4 session-6: retry the full-pipeline throughput bench with the
# flattened top-1 dispatch (s4 stage P hit the lane-padding compile-OOM
# this fixes).  Waits for the s5 seed-matrix queue.
# Usage: setsid nohup bash tools/r4_session6_queue.sh > /tmp/r4_s6_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== R4 S6 QUEUE START $(date -u) ==="
while ! grep -q "R4 S5 QUEUE COMPLETE" /tmp/r4_s5_queue.log 2>/dev/null; do
  sleep 300
done
echo "=== s5 done; chip free $(date -u) ==="
for b in 32 64; do
  timeout 3600 python benchmarks/bench_pipeline.py --batch $b \
    2>&1 | grep -v WARNING || echo "stage P b=$b FAILED"
done
timeout 3600 python benchmarks/bench_pipeline.py --batch 32 --mode sequential \
  2>&1 | grep -v WARNING || echo "sequential FAILED"
echo "=== R4 S6 QUEUE COMPLETE $(date -u) ==="
