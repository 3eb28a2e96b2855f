#!/bin/bash
# Session-4 serialized TPU chain (the session-3 queues D-H died with the VM
# reset; /tmp artifacts were lost).  Recovers, in order:
#   A. chip-health anchor gate (shared axon host intermittently halves tput)
#   B. hardware numeric check of the trainable fused DenseBlock after the
#      backward VMEM-planning commit (5cae82a) that never ran on silicon
#   C. fused training tables (VERDICT r2 item 2's "done" criterion)
#   D. training-precision A/B on color_distortion (the one residual parity
#      loss; ROADMAP r4 item 1)
#   E. seed reruns for pixelation_easy + high_light (PARITY.md queued rows)
#   F. anchor-gated headline bench
# Usage: setsid nohup bash tools/r3_session4_queue.sh > /tmp/r3_s4_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
echo "=== S4 QUEUE START $(date -u) ==="

anchor() {
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
tf = 2*4096**3/dt/1e12
print(f"ANCHOR {tf:.1f}")
import sys; sys.exit(0 if tf >= 85.0 else 1)
EOF
}

# NOTE: gate on the anchor's EXIT CODE, not grep (a failing anchor still
# prints its reading; `anchor | grep ANCHOR` passed the gate at 3.5 TF/s).
for i in $(seq 1 12); do
  if out=$(anchor 2>/dev/null); then echo "$out"; break; fi
  echo "$out"
  echo "=== anchor below 85 TF/s, waiting ($i/12) $(date -u) ==="
  sleep 300
done

if [ -z "${SKIP_STAGE_B:-}" ]; then
  echo "=== stage B: trainable-DB hardware check $(date -u) ==="
  timeout 1800 python tools/check_growth_tpu.py || echo "stage B FAILED"
fi

echo "=== stage C: fused training tables $(date -u) ==="
timeout 5400 python benchmarks/profile_train.py --only \
"train step (per-block remat),train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage C base FAILED"
timeout 5400 python benchmarks/profile_train.py --k-stack 48 --only \
"train step (fused DenseBlocks)" || echo "stage C k-stack FAILED"
timeout 5400 python benchmarks/profile_train.py --batch 128 --height 256 --width 256 --only \
"train step (per-block remat),train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage C b128 FAILED"
timeout 5400 python benchmarks/profile_train.py --batch 256 --height 256 --width 256 --only \
"train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage C b256 probe failed (OOM is an acceptable answer)"

echo "=== stage D: color_distortion precision A/B $(date -u) ==="
task=color_distortion
if [ ! -f /tmp/parity_r3/${task}/${task}_parity.json ]; then
  timeout 1800 python tools/parity/run_parity.py \
    --workdir /tmp/parity_r3/${task} --task ${task} \
    --epochs 30 --batch 4 --height 128 --width 192 --stage data \
    || echo "stage D data gen FAILED"
fi
if [ ! -f tools/parity/results_r3/${task}_precision_ab.json ]; then
  timeout 7200 python tools/parity/precision_ab.py \
    --workdir /tmp/parity_r3/${task} --task ${task} \
    || echo "stage D FAILED"
fi

echo "=== stage E: seed reruns $(date -u) ==="
for task in pixelation_easy high_light; do
  if [ ! -f /tmp/parity_r3/${task}/${task}_parity.json ]; then
    timeout 1800 python tools/parity/run_parity.py \
      --workdir /tmp/parity_r3/${task} --task ${task} \
      --epochs 30 --batch 4 --height 128 --width 192 --stage data \
      || { echo "stage E data gen FAILED for ${task}"; continue; }
  fi
  if [ ! -f tools/parity/results_r3/${task}_seed_rerun.json ]; then
    timeout 10800 python tools/parity/seed_rerun.py \
      --workdir /tmp/parity_r3/${task} --task ${task} --seeds 1337,2024 \
      || echo "stage E ${task} FAILED"
    cp /tmp/parity_r3/${task}/seed_rerun.json \
       tools/parity/results_r3/${task}_seed_rerun.json 2>/dev/null || true
  fi
done

echo "=== stage F: headline bench (anchor-gated) $(date -u) ==="
timeout 2400 python bench.py || echo "stage F FAILED"

echo "=== S4 QUEUE COMPLETE $(date -u) ==="
