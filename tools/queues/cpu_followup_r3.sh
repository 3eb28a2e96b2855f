#!/bin/bash
# CPU fallback follow-up: after the CPU ours-parity chain drains, run the
# perceptual-term substitution A/B on CPU if the TPU tunnel never healed to
# do it (stage D).  perceptual_ab.py's pid-claim makes the two queues safe
# to race.
#   nohup bash tools/parity/cpu_followup_r3.sh <ours_chain_pid> > /tmp/cpu_followup.log 2>&1 &
set -u
cd /root/repo
CHAIN_PID=${1:?usage: cpu_followup_r3.sh <ours_chain_pid>}

echo "=== followup: waiting for CPU ours chain (pid $CHAIN_PID) $(date)"
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 120; done

echo "=== followup: CPU chain done $(date)"
if [ -f /tmp/parity_r3/jpeg/perceptual_ab.json ]; then
  echo "perceptual_ab already complete"
elif grep -q "TUNNEL UP" /tmp/r3_watchdog.log 2>/dev/null; then
  echo "tunnel healed — TPU queue owns stage D; skipping CPU arm"
else
  echo "=== followup: perceptual A/B on CPU $(date)"
  timeout 21600 python -u tools/parity/perceptual_ab.py \
    --workdir /tmp/parity_r3/jpeg --cpu || echo "perceptual_ab CPU FAILED"
fi
echo "=== followup COMPLETE $(date)"

# Appended: seed-variance reruns on CPU if the TPU never took stage B3.
if grep -q "TUNNEL UP" /tmp/r3_watchdog.log 2>/dev/null; then
  echo "tunnel healed — TPU queue owns stage B3; skipping CPU seed reruns"
else
  echo "=== followup: seed-variance reruns on CPU $(date)"
  # 3 runs/losing-task (2 fresh seeds + torch_init A/B) at ~80 min each
  timeout 43200 python -u tools/parity/seed_rerun.py --root /tmp/parity_r3 --auto --cpu \
    || echo "seed_rerun CPU FAILED"
fi
echo "=== followup (incl. appends) COMPLETE $(date)"

# Appended: paired per-image checkpoint evals for any completed task.
for t in jpeg pixelation pixelation_easy pixelation_hard motion_blur high_light low_contrast color_distortion; do
  if [ -f /tmp/parity_r3/$t/ours_run.json ] && [ ! -f /tmp/parity_r3/$t/paired_eval.json ]; then
    timeout 1800 python tools/parity/paired_eval.py \
      --workdir /tmp/parity_r3/$t --task $t || echo "paired_eval $t FAILED"
  fi
done
echo "=== followup paired evals COMPLETE $(date)"
