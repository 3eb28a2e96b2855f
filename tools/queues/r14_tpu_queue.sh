#!/bin/bash
# Round-5 TPU chain #3: (a) seed-1337 confirmation of the topk80b
# equal-budget color result (raw 23.59 at seed 42 — is it the lever or the
# draw?), then (b) the training-throughput table (moved out of r13 to make
# room; r13's T marker was pre-set).  Hard-capped before the 03:10 UTC
# driver window.
# Usage: setsid nohup bash tools/queues/r14_tpu_queue.sh > /root/scratch/r14_tpu_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/scratch/jaxcache
RES=tools/parity/results_r3
WD=/root/scratch/parity_r3/full_color
echo "=== R14 TPU QUEUE START $(date -u) ==="
for i in $(seq 1 240); do
  [ -f /root/scratch/markers/r13_P.done ] && break
  sleep 60
done
echo "=== window open $(date -u) ==="

if [ ! -f "$WD/variant_topk80bs1337.json" ]; then
  echo "=== stage C: topk80b seed-1337 confirm $(date -u) ==="
  timeout 7200 python tools/parity/variant_run.py --workdir "$WD" \
    --task color_distortion --tag topk80bs1337 \
    --set 'loss.worst_case={"fraction":0.5,"scale":2.0}' \
    --set 'train.seed=1337' \
    2>&1 | grep -v WARNING || echo "stage C FAILED"
  cp "$WD/variant_topk80bs1337.json" "$RES/full_color_variant_topk80bs1337.json" 2>/dev/null
  git add "$RES/full_color_variant_topk80bs1337.json" 2>/dev/null \
    && git commit -q -m "topk80b worst-case color variant, seed-1337 confirmation (auto)" \
    || echo "stage C nothing to commit"
fi

# training-throughput table, capped to end before 03:05 UTC
NOW=$(date -u +%s); END=$(date -u -d "03:05" +%s)
[ $((END - NOW)) -lt 0 ] && END=$(date -u -d "03:05 next day" +%s)
BUDGET=$((END - NOW)); [ "$BUDGET" -gt 600 ] || BUDGET=600
echo "=== stage T: train throughput (budget ${BUDGET}s) $(date -u) ==="
timeout "$BUDGET" python benchmarks/train_throughput.py \
  --rows b16,b16_fused,b32,b64_remat,b64 2>&1 | grep -v WARNING \
  || echo "stage T hit budget/failed (partial rows are recorded)"
git add "$RES/train_throughput.json" 2>/dev/null \
  && git commit -q -m "Training-throughput table at 256x384 (auto)" \
  || echo "stage T nothing to commit"
touch /root/scratch/markers/r14_done
echo "=== R14 TPU QUEUE COMPLETE $(date -u) ==="
