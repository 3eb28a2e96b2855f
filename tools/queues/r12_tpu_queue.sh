#!/bin/bash
# Round-5 TPU chain #3: training-throughput table (VERDICT r4 item 6) after
# the r11 bench window completes.
# Usage: setsid nohup bash tools/queues/r12_tpu_queue.sh > /root/scratch/r12_tpu_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/scratch/jaxcache
RES=tools/parity/results_r3
echo "=== R12 TPU QUEUE START $(date -u) ==="
for i in $(seq 1 300); do
  [ -f /root/scratch/markers/r11_B.done ] && break
  sleep 60
done
echo "=== chip window open $(date -u) ==="

echo "=== stage T: train throughput table $(date -u) ==="
timeout 14400 python benchmarks/train_throughput.py \
  --rows b16,b16_fused,b32,b64_remat,b64 2>&1 | grep -v WARNING \
  || echo "stage T FAILED"
git add "$RES/train_throughput.json" 2>/dev/null \
  && git commit -q -m "Training-throughput table at 256x384 (b16..b64, fused/remat; auto)" \
  && echo "stage T committed" || echo "stage T nothing to commit"
touch /root/scratch/markers/r12_T.done
echo "=== R12 TPU QUEUE COMPLETE $(date -u) ==="
