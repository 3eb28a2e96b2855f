#!/bin/bash
# Round-4 CPU queue: ref-side seed matrices for the three losing parity rows
# (VERDICT r3 item 4: motion_blur, high_light, pixelation_easy at the
# round-3 reduced scale, seeds 1337+2024 to complement the seed-42
# headline runs).  Waits for the in-flight full-color torch ref run (pid
# passed as $1, artifact as backstop) so the 1-core host finishes the
# higher-priority full-scale run first.
set -u
cd /root/repo
COLOR_PID="${1:-0}"
COLOR_ARTIFACT=/root/scratch/parity_r3/full_color/ref_run.json

echo "=== R6 CPU QUEUE START $(date -u) ==="
while [ ! -f "$COLOR_ARTIFACT" ] && kill -0 "$COLOR_PID" 2>/dev/null; do
  sleep 120
done
echo "=== color ref run clear $(date -u) ==="
sleep 30

for task in motion_blur high_light pixelation_easy; do
  WD=/root/scratch/parity_r4/$task
  mkdir -p "$WD"
  if [ ! -d "$WD/paired" ]; then
    timeout 1800 nice -n 5 python tools/parity/run_parity.py \
      --workdir "$WD" --task "$task" \
      --epochs 30 --batch 4 --height 128 --width 192 --stage data \
      || { echo "$task data FAILED"; continue; }
  fi
  timeout 14400 nice -n 5 python tools/parity/ref_seed_rerun.py \
    --workdir "$WD" --task "$task" --seeds 1337,2024 \
    || echo "$task ref_seed_rerun FAILED"
  git add "tools/parity/results_r3/${task}_ref_seed_rerun.json" 2>/dev/null \
    && git commit -q -m "Ref-side seed matrix for $task (seeds 1337,2024; auto)" \
    && echo "committed $task" || echo "nothing to commit for $task"
done
echo "=== R6 CPU QUEUE COMPLETE $(date -u) ==="
