#!/bin/bash
# Round-5 CPU queue: reference-side color_distortion at an effective 120
# epochs (VERDICT r4 item 3a) — continue the ref's 80-epoch best checkpoint
# for 40 more epochs (from-scratch 120 ep would cost ~12 h at the measured
# 356 s/epoch and cannot fit the round; ref_continue.py documents the
# fresh-Adam caveat).  Waits for the r6 queue's torch run to release the
# 1-core host.
#
# Usage: setsid nohup bash tools/queues/r10_cpu_queue.sh > /root/scratch/r10_cpu_queue.log 2>&1 &
set -u
cd /root/repo
WD=/root/scratch/parity_r3/full_color
RES=tools/parity/results_r3
echo "=== R10 CPU QUEUE START $(date -u) ==="

for i in $(seq 1 90); do
  grep -q "R6 CPU QUEUE COMPLETE" /root/scratch/r6_cpu_queue.log 2>/dev/null && break
  sleep 60
done
echo "=== host free $(date -u) ==="

if [ ! -f "$RES/color_distortion_ref_continue.json" ]; then
  timeout 21600 nice -n 5 python tools/parity/ref_continue.py \
    --workdir "$WD" --task color_distortion --extra-epochs 40 \
    || echo "ref_continue FAILED"
fi
git add "$RES/color_distortion_ref_continue.json" 2>/dev/null \
  && git commit -q -m "Reference-side color_distortion effective-120ep continuation probe (auto)" \
  && echo "committed ref_continue" || echo "nothing to commit"
touch /root/scratch/markers/r10_done
echo "=== R10 CPU QUEUE COMPLETE $(date -u) ==="
