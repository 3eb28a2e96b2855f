#!/bin/bash
# Round-3 torch-side parity queue (VERDICT items 3+4).
#
# This host has ONE CPU core, so every torch reference run must queue
# serially; the harness's --stage ref runs only the reference side, and the
# JAX side is run separately (on TPU) via --stage ours / --stage report.
#
# Order: the 80-epoch full-recipe longrun first (all-or-nothing deliverable),
# then the 8 remaining reduced-scale tasks (each one commits incrementally).
set -u
cd /root/repo
mkdir -p /tmp/parity_r3

echo "=== QUEUE START $(date) ==="
echo "=== longrun noise 80ep 256x384 b16: ref side ==="
python tools/parity/run_parity.py --workdir /tmp/parity_r3/full_noise --task noise \
  --epochs 80 --batch 16 --height 256 --width 384 --stage ref \
  && echo "=== longrun ref DONE $(date) ===" \
  || echo "=== longrun ref FAILED $(date) ==="

for task in jpeg pixelation pixelation_easy pixelation_hard motion_blur high_light low_contrast color_distortion; do
  echo "=== $task ref start $(date) ==="
  python tools/parity/run_parity.py --workdir /tmp/parity_r3/$task --task $task \
    --epochs 30 --batch 4 --height 128 --width 192 --stage ref \
    && echo "=== $task ref DONE $(date) ===" \
    || echo "=== $task ref FAILED $(date) ==="
done
echo "=== QUEUE COMPLETE $(date) ==="
