#!/bin/bash
# Round-5 TPU chain #2 (after the r9 quality chain releases the chip):
#   P. routed-pipeline end-to-end throughput (VERDICT r4 item 5): top1 +
#      sequential at serving shape, JSON artifact incl. capacity-drop rates
#   O. ordering-policy A/B on composed degradations (VERDICT r4 item 7):
#      reuses the trained /root/scratch/ab_seq experts; adds the
#      severity-ordered and ascending-control arms
#   B. healthy-window headline bench (VERDICT r4 item 2): gate on the
#      4096^3 anchor >=95 TF/s, retry up to ~3 h, then run bench.py with a
#      full budget; always keep the best annotated fallback
#
# Usage: setsid nohup bash tools/queues/r11_tpu_queue.sh > /root/scratch/r11_tpu_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/scratch/jaxcache
mkdir -p /root/scratch/markers
RES=tools/parity/results_r3
echo "=== R11 TPU QUEUE START $(date -u) ==="

# wait for the r9 chain (max 3 h)
for i in $(seq 1 180); do
  [ -f /root/scratch/markers/r9_X.done ] && break
  sleep 60
done
echo "=== chip window open $(date -u) ==="

# ---- P: routed-pipeline throughput (both modes)
echo "=== stage P: pipeline bench $(date -u) ==="
for mode in top1 sequential; do
  timeout 2400 python benchmarks/bench_pipeline.py --mode "$mode" \
    --batch 32 --iters 20 2>&1 | grep -v WARNING || echo "stage P/$mode FAILED"
done
git add "$RES/pipeline_bench.json" 2>/dev/null \
  && git commit -q -m "Routed-pipeline end-to-end TPU throughput (top1+sequential, B=32 256x384; auto)" \
  && echo "stage P committed" || echo "stage P nothing to commit"
touch /root/scratch/markers/r11_P.done

# ---- O: ordering-policy A/B (expert weights already trained in r8)
echo "=== stage O: ordering A/B $(date -u) ==="
timeout 7200 python benchmarks/ab_seq_routing.py \
  --workdir /root/scratch/ab_seq 2>&1 | grep -v WARNING \
  || echo "stage O FAILED"
git add "$RES/seq_routing_ab.json" 2>/dev/null \
  && git commit -q -m "Ordering-policy A/B: severity-ordered vs fixed sequential routing (auto)" \
  && echo "stage O committed" || echo "stage O nothing to commit"
touch /root/scratch/markers/r11_O.done

# ---- B: healthy-window headline bench
echo "=== stage B: healthy-window bench $(date -u) ==="
HEALTHY=0
for i in $(seq 1 18); do
  if timeout 300 python tools/probe_anchor.py --min-tflops 95 \
       2>/dev/null | tee /root/scratch/anchor_probe.json; then
    HEALTHY=1; break
  fi
  echo "[watchdog] anchor degraded ($(date -u)); sleeping 600"
  sleep 600
done
echo "[watchdog] healthy=$HEALTHY; running bench ($(date -u))"
BENCH_BUDGET_S=1500 timeout 1560 python bench.py \
  2> /root/scratch/bench_r5_healthy.err | tee /root/scratch/bench_r5_healthy.json
tail -6 /root/scratch/bench_r5_healthy.err
if [ -s /root/scratch/bench_r5_healthy.json ]; then
  cp /root/scratch/bench_r5_healthy.json "$RES/bench_r5_window.json"
  git add "$RES/bench_r5_window.json" \
    && git commit -q -m "Round-5 bench window run (anchor-gated; auto)" \
    && echo "stage B committed" || echo "stage B nothing to commit"
fi
touch /root/scratch/markers/r11_B.done
echo "=== R11 TPU QUEUE COMPLETE $(date -u) ==="
