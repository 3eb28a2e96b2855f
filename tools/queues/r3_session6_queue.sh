#!/bin/bash
# Session-6 conditional follow-up: runs AFTER tools/r3_session5_queue.sh.
# Stage G extends the training-precision investigation to the other
# unexplained bf16-era parity losses, but only if stage D's diagnostic
# (color_distortion fp32 retrain) shows precision is actually the cause:
#   delta >= +0.5 dB  → run precision A/Bs on high_light + pixelation_easy
#   delta <  +0.5 dB  → precision is exculpated; skip (seed spread and BN
#                       recal already bound those deficits — PARITY.md)
# motion_blur is excluded either way: its 3-seed matrix already spans the
# deficit (spread 1.21 dB, seed-1337 ours wins +0.45).
# Usage: setsid nohup bash tools/r3_session6_queue.sh > /tmp/r3_s6_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
echo "=== S6 QUEUE START $(date -u) ==="

# ---- wait for the session-5 queue to finish (it owns the chip until then);
# completion marker in its log, not process matching (kill-by-pattern hazard)
S5_LOG=/tmp/r3_s5_queue.log
while [ -f "$S5_LOG" ] && ! grep -q "S5 QUEUE COMPLETE" "$S5_LOG"; do
  sleep 120
done
echo "=== s5 queue done $(date -u) ==="

anchor_tf() {
  timeout 420 python - <<'EOF'
import time, jax, jax.numpy as jnp
a = jnp.ones((4096,4096), jnp.bfloat16); b = jnp.ones((4096,4096), jnp.bfloat16)
f = jax.jit(lambda a,b: a@b)
acc = jnp.mean(f(a,b)).astype(jnp.float32); float(acc)
t0 = time.perf_counter()
acc = jnp.zeros((), jnp.float32)
for i in range(20):
    acc = acc + jnp.mean(f(a,b)).astype(jnp.float32)
float(acc)
dt = (time.perf_counter()-t0)/20
print(f"{2*4096**3/dt/1e12:.1f}")
EOF
}

anchor_gate() {
  local thr=$1 deadline_min=$2 t0 tf
  t0=$(date +%s)
  while :; do
    tf=$(anchor_tf 2>/dev/null | tail -1)
    echo "ANCHOR ${tf:-probe-failed} (need >= $thr) $(date -u)"
    awk -v a="${tf:-0}" -v t="$thr" 'BEGIN{exit !(a+0>=t+0)}' && return 0
    if [ $(( $(date +%s) - t0 )) -ge $(( deadline_min * 60 )) ]; then
      echo "=== anchor gate $thr TF/s: deadline ${deadline_min}m hit ==="
      return 1
    fi
    sleep 300
  done
}

# ---- stage G: conditional precision A/Bs (QUALITY gate)
AB=tools/parity/results_r3/color_distortion_precision_ab.json
if [ -f "$AB" ]; then
  go=$(python - <<'EOF'
import json
ab = json.load(open("tools/parity/results_r3/color_distortion_precision_ab.json"))
d = ab.get("delta_psnr_db")
print("yes" if (d is not None and d >= 0.5) else "no")
EOF
)
  echo "stage G condition: color_distortion fp32 delta gate -> ${go}"
  if [ "$go" = "yes" ]; then
    for task in high_light pixelation_easy; do
      [ -f tools/parity/results_r3/${task}_precision_ab.json ] && continue
      if anchor_gate 35 60; then
        echo "=== stage G: ${task} precision A/B $(date -u) ==="
        if [ ! -f /tmp/parity_r3/${task}/${task}_parity.json ]; then
          timeout 2400 python tools/parity/run_parity.py \
            --workdir /tmp/parity_r3/${task} --task ${task} \
            --epochs 30 --batch 4 --height 128 --width 192 --stage data \
            || { echo "stage G data gen FAILED for ${task}"; continue; }
        fi
        timeout 7200 python tools/parity/precision_ab.py \
          --workdir /tmp/parity_r3/${task} --task ${task} \
          || echo "stage G ${task} FAILED"
      else
        echo "=== stage G ${task} SKIPPED (chip sick past deadline) ==="
      fi
    done
  fi
else
  echo "stage G skipped: no color_distortion precision A/B result"
fi

# ---- stage H: print the measured-precision defaults (apply is a reviewed commit)
python tools/set_precision_defaults.py --dry-run || true

echo "=== S6 QUEUE COMPLETE $(date -u) ==="
