#!/bin/bash
# Round-4 session-2 chain: bracket the full-scale noise longrun with a second
# ours-side seed (PARITY.md notes the 80-epoch row is single-seed on both
# sides; a fresh-seed ours run turns the -0.15 dB "practical tie" into a
# variance-bracketed statement like the reduced-scale rows).
#
#   X. regenerate the full-noise parity dataset (deterministic, seed 42)
#   Y. ours-side 80ep 256x384 b16 at train.seed=1337 via seed_rerun.py
#      (no torch-init variant — one 3h run); snapshot + commit
#
# Waits for the r4 session-1 queue's TPU stages to finish first.
# Usage: setsid nohup bash tools/r4_session2_queue.sh > /tmp/r4_s2_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
WD=/tmp/parity_r3/full_noise
echo "=== R4 S2 QUEUE START $(date -u) ==="

while ! grep -q "TPU stages complete" /tmp/r4_s1_queue.log 2>/dev/null; do
  sleep 300
done
echo "=== s1 TPU stages done; chip free $(date -u) ==="

# hard deadline guard: a full 80-epoch run needs ~3 h; don't start one that
# would still hold the chip when the end-of-round driver bench fires.
NOW=$(date -u +%s)
CUTOFF=$(date -u -d 'tomorrow 04:30' +%s)
if [ "$NOW" -ge "$CUTOFF" ]; then
  echo "=== past the 04:30 UTC cutoff; skipping the full-noise seed run ==="
  exit 0
fi

# stage X: dataset + config (deterministic regeneration after the VM reset)
timeout 1800 python tools/parity/run_parity.py --workdir "$WD" --task noise \
  --epochs 80 --batch 16 --height 256 --width 384 --stage data \
  || { echo "stage X FAILED"; exit 1; }

# stage Y: one fresh-seed ours run at full scale
timeout 14400 python tools/parity/seed_rerun.py --workdir "$WD" --task noise \
  --seeds 1337 --no-torch-init-ab \
  || echo "stage Y FAILED"

if [ -f "$WD/seed_rerun.json" ]; then
  cp "$WD/seed_rerun.json" tools/parity/results_r3/full_noise_seed_rerun.json
  git add tools/parity/results_r3/full_noise_seed_rerun.json \
    && git commit -q -m "Snapshot full-scale noise fresh-seed rerun (auto)" \
    && echo "snapshot committed" || echo "nothing to commit"
fi
echo "=== R4 S2 QUEUE COMPLETE $(date -u) ==="
