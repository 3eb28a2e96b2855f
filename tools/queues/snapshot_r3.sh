#!/bin/bash
# Persist round-3 parity/measurement artifacts from the ephemeral /tmp
# workdirs into the repo as the background queues complete them, committing
# when anything changed.  Runs detached:
#   nohup bash tools/parity/snapshot_r3.sh > /tmp/snapshot_r3.log 2>&1 &
set -u
cd /root/repo
DEST=tools/parity/results_r3
mkdir -p "$DEST"

while true; do
  python tools/parity/report_r3.py --root /tmp/parity_r3 >/dev/null 2>&1 || true
  cp -f /tmp/parity_r3/parity_r3.json "$DEST/" 2>/dev/null || true
  for d in /tmp/parity_r3/*/; do
    t=$(basename "$d")
    [ -f "$d/recal_ab.json" ] && cp -f "$d/recal_ab.json" "$DEST/${t}_recal_ab.json"
    [ -f "$d/perceptual_ab.json" ] && cp -f "$d/perceptual_ab.json" "$DEST/${t}_perceptual_ab.json"
    [ -f "$d/seed_rerun.json" ] && cp -f "$d/seed_rerun.json" "$DEST/${t}_seed_rerun.json"
    [ -f "$d/paired_eval.json" ] && cp -f "$d/paired_eval.json" "$DEST/${t}_paired_eval.json"
    [ -f "$d/ours_run.json" ] && [ ! -f "$DEST/${t}_recal_ab.json" ] && \
      cp -f "$d/ours_run.json" "$DEST/${t}_ours_run_mark.json"
  done
  [ -f runs_classifier/r3_scale/summary.json ] && \
    cp -f runs_classifier/r3_scale/summary.json "$DEST/classifier_r3_scale_summary.json"
  [ -f config/serving_tuning.json ] && true  # already in-repo
  # Raw logs of the heal-time TPU stages: the training/eval/bench tables
  # print to stdout and would otherwise live only in ephemeral /tmp.  The
  # watchdog log is only interesting (and only stops being probe noise)
  # once the tunnel heals and the stage A + queue output lands in it.
  for lg in /tmp/r3_stage_a.log /tmp/r3_queue.log; do
    [ -f "$lg" ] && cp -f "$lg" "$DEST/logs_$(basename "$lg" .log).txt"
  done
  if grep -q "TUNNEL UP" /tmp/r3_watchdog.log 2>/dev/null; then
    cp -f /tmp/r3_watchdog.log "$DEST/logs_r3_watchdog.txt"
  fi

  if ! git diff --quiet -- "$DEST" || [ -n "$(git status --porcelain "$DEST")" ]; then
    for i in 1 2 3; do
      git add "$DEST" && \
      git commit -q -m "Snapshot round-3 measurement artifacts (auto)" && break
      sleep 20
    done
    echo "committed snapshot $(date)"
  fi
  sleep 900
done
