#!/bin/bash
# Round-5 TPU chain #1 (quality items from VERDICT r4):
#   E. finish the interrupted ep160 color trajectory point (test-only —
#      weights already trained; round-4 run was killed mid-test)
#   M. ours-side motion_blur seed 2024 (completes the n=3 means both sides,
#      VERDICT r4 item 4)
#   W. color_distortion worst-case-weighting A/B at the reference's 80-epoch
#      budget (VERDICT r4 item 3b), stock + BN-recal eval, two (frac,scale)
#      points
#   X. motion_blur worst-case-weighting A/B at the reduced protocol scale
# Waits for the dryrun cache warmup and the r6 CPU queue (torch ref) so the
# 1-core host and the chip are quiet.  Everything idempotent; artifacts
# committed as they land.
#
# Usage: setsid nohup bash tools/queues/r9_tpu_queue.sh > /root/scratch/r9_tpu_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/scratch/jaxcache
mkdir -p /root/scratch/jaxcache /root/scratch/markers
WD=/root/scratch/parity_r3/full_color
MB=/root/scratch/parity_r4/motion_blur
RES=tools/parity/results_r3
echo "=== R9 TPU QUEUE START $(date -u) ==="

# wait for the dryrun compile-cache warmup (max 50 min)
for i in $(seq 1 100); do
  [ -f /root/scratch/markers/r5_dryrun_warm.done ] && break
  sleep 30
done
# wait for the r6 CPU queue's torch ref run to release the host (max 40 min)
for i in $(seq 1 80); do
  grep -q "R6 CPU QUEUE COMPLETE" /root/scratch/r6_cpu_queue.log 2>/dev/null && break
  sleep 30
done
echo "=== host window open $(date -u) ==="

# ---- E: ep160 color test completion (weights exist -> test-only)
if [ ! -f "$WD/variant_ep160.json" ]; then
  echo "=== stage E: ep160 test completion $(date -u) ==="
  timeout 2400 python tools/parity/variant_run.py --workdir "$WD" \
    --task color_distortion --tag ep160 --set 'train.n_epoch=160' \
    2>&1 | grep -v WARNING || echo "stage E FAILED"
  cp "$WD/variant_ep160.json" "$RES/full_color_variant_ep160.json" 2>/dev/null
  git add "$RES/full_color_variant_ep160.json" 2>/dev/null \
    && git commit -q -m "Full-scale color_distortion ep160 trajectory point (auto)" \
    && echo "stage E committed" || echo "stage E nothing to commit"
fi
touch /root/scratch/markers/r9_E.done

# ---- M: ours-side motion_blur seed 2024 (reduced protocol scale)
echo "=== stage M: motion_blur ours seed 2024 $(date -u) ==="
if [ ! -f "$MB/seed_rerun.json" ] && [ -f "$RES/motion_blur_seed_rerun.json" ]; then
  cp "$RES/motion_blur_seed_rerun.json" "$MB/seed_rerun.json"
  echo "seeded $MB/seed_rerun.json from committed snapshot"
fi
timeout 7200 python tools/parity/seed_rerun.py --workdir "$MB" \
  --task motion_blur --seeds 2024 --no-torch-init-ab \
  2>&1 | grep -v WARNING || echo "stage M FAILED"
cp "$MB/seed_rerun.json" "$RES/motion_blur_seed_rerun.json" 2>/dev/null
git add "$RES/motion_blur_seed_rerun.json" 2>/dev/null \
  && git commit -q -m "Ours-side motion_blur seed 2024 (n=3 seed matrix; auto)" \
  && echo "stage M committed" || echo "stage M nothing to commit"
touch /root/scratch/markers/r9_M.done

# ---- W: color worst-case weighting at the 80-epoch reference budget
for spec in 'topk80:{"fraction":0.25,"scale":3.0}' 'topk80b:{"fraction":0.5,"scale":2.0}'; do
  tag="${spec%%:*}"; wc="${spec#*:}"
  echo "=== stage W/$tag: color worst-case A/B $(date -u) ==="
  if [ ! -f "$WD/variant_${tag}.json" ]; then
    timeout 10800 python tools/parity/variant_run.py --workdir "$WD" \
      --task color_distortion --tag "$tag" \
      --set "loss.worst_case=$wc" \
      2>&1 | grep -v WARNING || { echo "stage W/$tag FAILED"; continue; }
  fi
  # BN-recal eval of the same weights (color's measured recal gain: +0.29 dB)
  if [ -f "$WD/variant_${tag}.json" ] && [ ! -f "$WD/variant_${tag}_recal.json" ]; then
    ( cd "$WD/ours_${tag}" \
      && timeout 1800 python /root/repo/tools/recalibrate_bn.py \
           -c "$WD/color_distortion_parity_${tag}.json" --passes 3 \
      && timeout 1800 python /root/repo/run.py \
           -c "$WD/color_distortion_parity_${tag}.json" -p test ) \
      2>&1 | grep -v WARNING | tail -4
    python - "$WD" "$tag" <<'PYEOF'
import json, os, sys
sys.path.insert(0, "/root/repo")
from tools.parity.run_parity import extract_metrics
wd, tag = sys.argv[1], sys.argv[2]
runs = os.path.join(wd, f"ours_{tag}", "runs", "color_distortion_parity")
latest = os.path.join(runs, sorted(os.listdir(runs))[-1])
m = extract_metrics(latest)
with open(os.path.join(wd, f"variant_{tag}_recal.json"), "w") as f:
    json.dump({"tag": tag + "_recal", **m}, f, indent=2)
print("recal:", m)
PYEOF
  fi
  cp "$WD/variant_${tag}.json" "$RES/full_color_variant_${tag}.json" 2>/dev/null
  cp "$WD/variant_${tag}_recal.json" "$RES/full_color_variant_${tag}_recal.json" 2>/dev/null
  git add "$RES/full_color_variant_${tag}.json" "$RES/full_color_variant_${tag}_recal.json" 2>/dev/null \
    && git commit -q -m "Full-scale color_distortion worst-case-weighting A/B ($tag, 80 ep; auto)" \
    && echo "stage W/$tag committed" || echo "stage W/$tag nothing to commit"
done
touch /root/scratch/markers/r9_W.done

# ---- X: motion_blur worst-case weighting at reduced scale
echo "=== stage X: motion_blur worst-case A/B $(date -u) ==="
if [ ! -f "$MB/variant_topk.json" ]; then
  timeout 7200 python tools/parity/variant_run.py --workdir "$MB" \
    --task motion_blur --tag topk \
    --set 'loss.worst_case={"fraction":0.25,"scale":3.0}' \
    2>&1 | grep -v WARNING || echo "stage X FAILED"
fi
cp "$MB/variant_topk.json" "$RES/motion_blur_variant_topk.json" 2>/dev/null
git add "$RES/motion_blur_variant_topk.json" 2>/dev/null \
  && git commit -q -m "Reduced-scale motion_blur worst-case-weighting A/B (auto)" \
  && echo "stage X committed" || echo "stage X nothing to commit"
touch /root/scratch/markers/r9_X.done
echo "=== R9 TPU QUEUE COMPLETE $(date -u) ==="
