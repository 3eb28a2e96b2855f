#!/bin/bash
# Round-4 session-4 chain: secondary measurements after the s3 perf stages.
#
#   P. full-pipeline throughput (classify -> top-1 routed 9-expert bank ->
#      restore) at the serving resolution, B=32 and B=64
#   Q. engine eval wall-clock (writer-pool A/B, now with the native libpng
#      encoder on the write side)
#
# Usage: setsid nohup bash tools/r4_session4_queue.sh > /tmp/r4_s4_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo "=== R4 S4 QUEUE START $(date -u) ==="

while ! grep -q "R4 S3 QUEUE COMPLETE" /tmp/r4_s3_queue.log 2>/dev/null; do
  sleep 300
done
echo "=== s3 done; chip free $(date -u) ==="

echo "=== stage P: pipeline throughput $(date -u) ==="
for b in 32 64; do
  timeout 3600 python benchmarks/bench_pipeline.py --batch $b \
    2>&1 | grep -v WARNING || echo "stage P b=$b FAILED"
done

echo "=== stage Q: eval wall-clock (native writer) $(date -u) ==="
timeout 3600 python benchmarks/eval_wallclock.py \
  2>&1 | grep -v WARNING || echo "stage Q FAILED"

echo "=== R4 S4 QUEUE COMPLETE $(date -u) ==="
