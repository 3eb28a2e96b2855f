#!/bin/bash
# Round-4 TPU chain (VERDICT r3 item 3): full-scale color_distortion parity.
#   C1. ours full-recipe run (80ep 256x384 b16, TPU) on the already-generated
#       paired set in /root/scratch/parity_r3/full_color
#   C2. ours seed matrix (1337, 2024) at the same scale
#   R.  wait for the in-flight torch ref run (started 10:07, ~6h on this
#       1-core host), then the report stage + snapshot + commit.
# Workdir lives under /root/scratch (VM-reset-proof); every stage is
# idempotent so a reset just re-runs the tail.
#
# Usage: setsid nohup bash tools/queues/r7_tpu_queue.sh > /root/scratch/r7_tpu_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/scratch/jaxcache
mkdir -p /root/scratch/jaxcache /root/scratch/markers
WD=/root/scratch/parity_r3/full_color
RES=tools/parity/results_r3
echo "=== R7 TPU QUEUE START $(date -u) ==="

# ---- C1: ours full-scale seed-42 (skip if its mark already exists)
if [ ! -f "$WD/ours_run.json" ]; then
  echo "=== stage C1: ours full color seed-42 $(date -u) ==="
  timeout 10800 python tools/parity/run_parity.py --workdir "$WD" \
    --task color_distortion --epochs 80 --batch 16 --height 256 --width 384 \
    --stage ours --ours-tpu 2>&1 | grep -v WARNING || echo "stage C1 FAILED"
fi
touch /root/scratch/markers/r7_C1.done
echo "=== stage C1 done $(date -u) ==="

# ---- C2: ours seed matrix at full scale
echo "=== stage C2: ours color seed matrix 1337,2024 $(date -u) ==="
timeout 21600 python tools/parity/seed_rerun.py --workdir "$WD" \
  --task color_distortion --seeds 1337,2024 --no-torch-init-ab \
  2>&1 | grep -v WARNING || echo "stage C2 FAILED"
cp "$WD/seed_rerun.json" "$RES/full_color_seed_rerun.json" 2>/dev/null
touch /root/scratch/markers/r7_C2.done
echo "=== stage C2 done $(date -u) ==="

# ---- R: report once the torch ref run lands (it writes ref_run.json)
echo "=== stage R: waiting for ref run $(date -u) ==="
for i in $(seq 1 240); do
  [ -f "$WD/ref_run.json" ] && break
  sleep 120
done
if [ -f "$WD/ref_run.json" ]; then
  timeout 1800 python tools/parity/run_parity.py --workdir "$WD" \
    --task color_distortion --epochs 80 --batch 16 --height 256 --width 384 \
    --stage report 2>&1 | grep -v WARNING || echo "stage R FAILED"
  cp "$WD/parity_result.json" "$RES/full_color_parity.json" 2>/dev/null
else
  echo "stage R: ref run never landed; skipping report"
fi

git add "$RES/full_color_parity.json" "$RES/full_color_seed_rerun.json" 2>/dev/null \
  && git commit -q -m "Snapshot full-scale color_distortion parity (ours seed matrix + report, auto)" \
  && echo "snapshot committed" || echo "nothing to commit"
echo "=== R7 TPU QUEUE COMPLETE $(date -u) ==="
