#!/bin/bash
# Session-5 serialized TPU chain.  Session 4's queue gated once up front and
# then ran every stage regardless; with the shared axon host reading
# 3.3-3.7 TF/s on the 4096^3 bf16 anchor (healthy ~107) that would have
# burned the timing stages on garbage numbers and blown the training-stage
# timeouts.  v2 gates per stage, two tiers:
#   TIMING  (>=85 TF/s): numbers get recorded in PERF.md/BENCH — never run sick
#   QUALITY (>=35 TF/s): parity training runs — results are PSNR, not ms, but
#                        a 30x-slow chip blows their wall-clock timeouts
# A stage whose gate times out is SKIPPED (logged), not run sick.
# Order: numeric check first (gate-free), then quality stages, then timing.
# Usage: setsid nohup bash tools/r3_session5_queue.sh > /tmp/r3_s5_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
echo "=== S5 QUEUE START $(date -u) ==="

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

# anchor_gate THRESHOLD MAX_MINUTES -> 0 if healthy, 1 if deadline hit
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

# ---- stage B: trainable-DB hardware numeric check (gate-free: values, not ms)
if [ ! -f /tmp/r3_s5_stageB.done ]; then
  echo "=== stage B: trainable-DB hardware check $(date -u) ==="
  timeout 2400 python tools/check_growth_tpu.py && touch /tmp/r3_s5_stageB.done \
    || echo "stage B FAILED"
fi

# ---- stage D: color_distortion training-precision A/B (QUALITY gate)
task=color_distortion
if [ ! -f tools/parity/results_r3/${task}_precision_ab.json ]; then
  if anchor_gate 35 90; then
    echo "=== stage D: ${task} precision A/B $(date -u) ==="
    if [ ! -f /tmp/parity_r3/${task}/${task}_parity.json ]; then
      timeout 2400 python tools/parity/run_parity.py \
        --workdir /tmp/parity_r3/${task} --task ${task} \
        --epochs 30 --batch 4 --height 128 --width 192 --stage data \
        || echo "stage D data gen FAILED"
    fi
    timeout 7200 python tools/parity/precision_ab.py \
      --workdir /tmp/parity_r3/${task} --task ${task} \
      || echo "stage D FAILED"
  else
    echo "=== stage D SKIPPED (chip sick past deadline) ==="
  fi
fi

# ---- stage E: seed reruns for the two queued PARITY rows (QUALITY gate)
for task in pixelation_easy high_light; do
  [ -f tools/parity/results_r3/${task}_seed_rerun.json ] && continue
  if anchor_gate 35 45; then
    echo "=== stage E: ${task} seed rerun $(date -u) ==="
    if [ ! -f /tmp/parity_r3/${task}/${task}_parity.json ]; then
      timeout 2400 python tools/parity/run_parity.py \
        --workdir /tmp/parity_r3/${task} --task ${task} \
        --epochs 30 --batch 4 --height 128 --width 192 --stage data \
        || { echo "stage E data gen FAILED for ${task}"; continue; }
    fi
    timeout 10800 python tools/parity/seed_rerun.py \
      --workdir /tmp/parity_r3/${task} --task ${task} --seeds 1337,2024 \
      || echo "stage E ${task} FAILED"
    cp /tmp/parity_r3/${task}/seed_rerun.json \
       tools/parity/results_r3/${task}_seed_rerun.json 2>/dev/null || true
  else
    echo "=== stage E ${task} SKIPPED (chip sick past deadline) ==="
  fi
done

# ---- stage C: fused training tables (TIMING gate — recorded in PERF.md)
if anchor_gate 85 150; then
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
else
  echo "=== stage C SKIPPED (chip sick past deadline) ==="
fi

# ---- stage F: headline bench (bench.py self-gates on the anchor too)
if anchor_gate 85 180; then
  echo "=== stage F: headline bench $(date -u) ==="
  timeout 2400 python bench.py || echo "stage F FAILED"
else
  echo "=== stage F SKIPPED (chip sick past deadline) ==="
fi

echo "=== S5 QUEUE COMPLETE $(date -u) ==="
