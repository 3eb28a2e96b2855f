#!/bin/bash
# Round-5 TPU chain #2 (replaces the r11/r12 linear chains): an
# anchor-aware scheduler.  Each cycle probes chip health; a healthy window
# (>=95 TF/s) immediately takes the headline bench (VERDICT r4 item 2);
# degraded windows run the throughput-insensitive quality stages instead:
#   L2/L3. color_distortion lr A/B at the 80-epoch reference budget
#          (equal-budget convergence-speed lever; cosine and worst-case
#          both measured flat)
#   O.     ordering-policy A/B (severity vs fixed sequential routing)
#   P.     routed-pipeline throughput (annotated with its own anchor)
#   T.     training-throughput table
# Hard deadline 03:10 UTC: stop starting stages, force the bench
# (annotated) if no healthy window appeared, and exit so the driver gets a
# quiet chip.
#
# Usage: setsid nohup bash tools/queues/r13_tpu_queue.sh > /root/scratch/r13_tpu_queue.log 2>&1 &
set -u
set -o pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/scratch/jaxcache
mkdir -p /root/scratch/markers
RES=tools/parity/results_r3
WD=/root/scratch/parity_r3/full_color
M=/root/scratch/markers
DEADLINE=$(date -u -d "03:10 next day" +%s 2>/dev/null || echo 9999999999)
NOW=$(date -u +%s)
# if launched before midnight, "03:10 next day" is right; after midnight use today
if [ $((DEADLINE - NOW)) -gt 86400 ]; then DEADLINE=$(date -u -d "03:10" +%s); fi
echo "=== R13 TPU QUEUE START $(date -u) (deadline $(date -u -d @$DEADLINE)) ==="

for i in $(seq 1 180); do
  [ -f "$M/r9_X.done" ] && break
  sleep 60
done
echo "=== chip window open $(date -u) ==="

past_deadline() { [ "$(date -u +%s)" -ge "$DEADLINE" ]; }

run_lr() { # $1=tag $2=lr
  local tag=$1 lr=$2
  [ -f "$WD/variant_${tag}.json" ] && return 0
  echo "=== stage L/$tag (lr=$lr) $(date -u) ==="
  timeout 7200 python tools/parity/variant_run.py --workdir "$WD" \
    --task color_distortion --tag "$tag" --set "train.lr=$lr" \
    2>&1 | grep -v WARNING || { echo "stage L/$tag FAILED"; return 0; }
  ( cd "$WD/ours_${tag}" \
    && timeout 1800 python /root/repo/tools/recalibrate_bn.py \
         -c "$WD/color_distortion_parity_${tag}.json" --passes 3 \
    && timeout 1800 python /root/repo/run.py \
         -c "$WD/color_distortion_parity_${tag}.json" -p test ) \
    2>&1 | grep -v WARNING | tail -3
  python - "$WD" "$tag" <<'PYEOF'
import json, os, sys
sys.path.insert(0, "/root/repo")
from tools.parity.run_parity import extract_metrics
wd, tag = sys.argv[1], sys.argv[2]
runs = os.path.join(wd, f"ours_{tag}", "runs", "color_distortion_parity")
latest = os.path.join(runs, sorted(os.listdir(runs))[-1])
json.dump({"tag": tag + "_recal", **extract_metrics(latest)},
          open(os.path.join(wd, f"variant_{tag}_recal.json"), "w"), indent=2)
PYEOF
  cp "$WD/variant_${tag}.json" "$RES/full_color_variant_${tag}.json" 2>/dev/null
  cp "$WD/variant_${tag}_recal.json" "$RES/full_color_variant_${tag}_recal.json" 2>/dev/null
  git add "$RES/full_color_variant_${tag}"*.json 2>/dev/null \
    && git commit -q -m "Full-scale color_distortion lr A/B ($tag, 80 ep; auto)" || true
}

run_O() {
  [ -f "$M/r13_O.done" ] && return 0
  echo "=== stage O: ordering A/B $(date -u) ==="
  timeout 7200 python benchmarks/ab_seq_routing.py \
    --workdir /root/scratch/ab_seq 2>&1 | grep -v WARNING \
    || echo "stage O FAILED"
  git add "$RES/seq_routing_ab.json" 2>/dev/null \
    && git commit -q -m "Ordering-policy A/B: severity vs fixed sequential routing (auto)" || true
  touch "$M/r13_O.done"
}

run_P() {
  [ -f "$M/r13_P.done" ] && return 0
  echo "=== stage P: pipeline bench $(date -u) ==="
  for mode in top1 sequential; do
    timeout 2400 python benchmarks/bench_pipeline.py --mode "$mode" \
      --batch 32 --iters 20 2>&1 | grep -v WARNING || echo "stage P/$mode FAILED"
  done
  git add "$RES/pipeline_bench.json" 2>/dev/null \
    && git commit -q -m "Routed-pipeline end-to-end TPU throughput (top1+sequential; auto)" || true
  touch "$M/r13_P.done"
}

run_T() {
  [ -f "$M/r13_T.done" ] && return 0
  echo "=== stage T: train throughput $(date -u) ==="
  timeout 10800 python benchmarks/train_throughput.py \
    --rows b16,b16_fused,b32,b64_remat,b64 2>&1 | grep -v WARNING \
    || echo "stage T FAILED"
  git add "$RES/train_throughput.json" 2>/dev/null \
    && git commit -q -m "Training-throughput table at 256x384 (auto)" || true
  touch "$M/r13_T.done"
}

run_bench() { # $1=forced|healthy
  echo "=== stage B ($1) $(date -u) ==="
  BENCH_BUDGET_S=1500 timeout 1560 python bench.py \
    2> /root/scratch/bench_r5_healthy.err | tee /root/scratch/bench_r5_healthy.json
  tail -4 /root/scratch/bench_r5_healthy.err
  if [ -s /root/scratch/bench_r5_healthy.json ]; then
    cp /root/scratch/bench_r5_healthy.json "$RES/bench_r5_window.json"
    git add "$RES/bench_r5_window.json" \
      && git commit -q -m "Round-5 bench window run ($1; auto)" || true
  fi
  touch "$M/r13_B.done"
}

while true; do
  if past_deadline; then
    echo "[r13] deadline reached $(date -u)"
    [ -f "$M/r13_B.done" ] || run_bench forced
    break
  fi
  if [ ! -f "$M/r13_B.done" ] \
     && timeout 300 python tools/probe_anchor.py --min-tflops 95 2>/dev/null \
        | tee -a /root/scratch/anchor_probes_r13.log; then
    run_bench healthy
    continue
  fi
  # degraded (or bench already done): run the next pending stage
  if   [ ! -f "$WD/variant_lr2e3.json" ]; then run_lr lr2e3 0.002
  elif [ ! -f "$M/r13_O.done" ]; then run_O
  elif [ ! -f "$WD/variant_lr3e3.json" ]; then run_lr lr3e3 0.003
  elif [ ! -f "$M/r13_P.done" ]; then run_P
  elif [ ! -f "$M/r13_T.done" ]; then run_T
  elif [ -f "$M/r13_B.done" ]; then echo "[r13] all stages done"; break
  else sleep 300  # only the bench remains; wait for a healthy window
  fi
done
echo "=== R13 TPU QUEUE COMPLETE $(date -u) ==="
