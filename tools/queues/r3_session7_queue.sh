#!/bin/bash
# Session-7 serialized TPU chain — split health gates.
#
# Diagnosis (2026-08-19 ~09:25Z, this host): the 4096^3 host-loop anchor read
# 3.3-3.6 TF/s while a device-side lax.scan of the same matmul read 62.9 TF/s
# and a tiny chained op cost 120 ms/call — the *tunnel dispatch RTT* is ~70x
# degraded, the chip itself is only in its known "halved" mode.  The old
# single anchor measured dispatch, not compute, and was wrongly blocking
# quality (PSNR) stages that tolerate slow dispatch.  Two probes now:
#   COMPUTE  (scan-chained, device-side)  — gates QUALITY stages  (>=35 TF/s)
#   HOSTLOOP (per-call dispatch included) — gates TIMING  stages  (>=85 TF/s)
# A stage whose gate times out is SKIPPED (logged), not run sick.
# Stage results are idempotent (done-files / result JSONs), so this safely
# resumes whatever session-5's chain did not get to.
# Usage: setsid nohup bash tools/r3_session7_queue.sh > /tmp/r3_s7_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
echo "=== S7 QUEUE START $(date -u) ==="

hostloop_tf() {
  timeout 600 python - <<'EOF' 2>/dev/null
import time, jax, jax.numpy as jnp
a = jnp.ones((4096,4096), jnp.bfloat16)
f = jax.jit(lambda a,b: a@b)
acc = jnp.mean(f(a,a)).astype(jnp.float32); float(acc)
t0 = time.perf_counter()
acc = jnp.zeros((), jnp.float32)
for i in range(20):
    acc = acc + jnp.mean(f(a,a)).astype(jnp.float32)
float(acc)
dt = (time.perf_counter()-t0)/20
print(f"{2*4096**3/dt/1e12:.1f}")
EOF
}

compute_tf() {
  timeout 600 python - <<'EOF' 2>/dev/null
import time, jax, jax.numpy as jnp
a = jnp.ones((4096,4096), jnp.bfloat16)
import functools
@jax.jit
def big(a):
    def body(c, _):
        return jnp.tanh(c @ a), None
    c, _ = jax.lax.scan(body, a, None, length=20)
    return jnp.mean(c)
r = big(a); float(r)
t0 = time.perf_counter()
r = big(a); float(r)
dt = time.perf_counter() - t0
print(f"{20*2*4096**3/dt/1e12:.1f}")
EOF
}

# gate PROBE THRESHOLD MAX_MINUTES -> 0 healthy / 1 deadline
gate() {
  local probe=$1 thr=$2 deadline_min=$3 t0 tf
  t0=$(date +%s)
  while :; do
    tf=$($probe | tail -1)
    echo "GATE[$probe] ${tf:-probe-failed} (need >= $thr) $(date -u)"
    awk -v a="${tf:-0}" -v t="$thr" 'BEGIN{exit !(a+0>=t+0)}' && return 0
    if [ $(( $(date +%s) - t0 )) -ge $(( deadline_min * 60 )) ]; then
      echo "=== gate $probe $thr: deadline ${deadline_min}m hit ==="
      return 1
    fi
    sleep 300
  done
}

# ---- stage D: color_distortion training-precision A/B (QUALITY: compute gate)
task=color_distortion
if [ ! -f tools/parity/results_r3/${task}_precision_ab.json ]; then
  if gate compute_tf 35 60; then
    echo "=== stage D: ${task} precision A/B $(date -u) ==="
    if [ ! -f /tmp/parity_r3/${task}/${task}_parity.json ]; then
      timeout 4800 python tools/parity/run_parity.py \
        --workdir /tmp/parity_r3/${task} --task ${task} \
        --epochs 30 --batch 4 --height 128 --width 192 --stage data \
        || echo "stage D data gen FAILED"
    fi
    timeout 10800 python tools/parity/precision_ab.py \
      --workdir /tmp/parity_r3/${task} --task ${task} \
      || echo "stage D FAILED"
  else
    echo "=== stage D SKIPPED ==="
  fi
fi

# ---- stage E: seed reruns for the two queued PARITY rows (QUALITY: compute gate)
for task in pixelation_easy high_light; do
  [ -f tools/parity/results_r3/${task}_seed_rerun.json ] && continue
  if gate compute_tf 35 45; then
    echo "=== stage E: ${task} seed rerun $(date -u) ==="
    if [ ! -f /tmp/parity_r3/${task}/${task}_parity.json ]; then
      timeout 4800 python tools/parity/run_parity.py \
        --workdir /tmp/parity_r3/${task} --task ${task} \
        --epochs 30 --batch 4 --height 128 --width 192 --stage data \
        || { echo "stage E data gen FAILED for ${task}"; continue; }
    fi
    timeout 14400 python tools/parity/seed_rerun.py \
      --workdir /tmp/parity_r3/${task} --task ${task} --seeds 1337,2024 \
      || echo "stage E ${task} FAILED"
    cp /tmp/parity_r3/${task}/seed_rerun.json \
       tools/parity/results_r3/${task}_seed_rerun.json 2>/dev/null || true
  else
    echo "=== stage E ${task} SKIPPED ==="
  fi
done

# ---- stage G: conditional precision A/Bs (QUALITY: compute gate)
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
      if gate compute_tf 35 45; then
        echo "=== stage G: ${task} precision A/B $(date -u) ==="
        if [ ! -f /tmp/parity_r3/${task}/${task}_parity.json ]; then
          timeout 4800 python tools/parity/run_parity.py \
            --workdir /tmp/parity_r3/${task} --task ${task} \
            --epochs 30 --batch 4 --height 128 --width 192 --stage data \
            || { echo "stage G data gen FAILED for ${task}"; continue; }
        fi
        timeout 10800 python tools/parity/precision_ab.py \
          --workdir /tmp/parity_r3/${task} --task ${task} \
          || echo "stage G ${task} FAILED"
      else
        echo "=== stage G ${task} SKIPPED ==="
      fi
    done
  fi
else
  echo "stage G skipped: no color_distortion precision A/B result"
fi

python tools/set_precision_defaults.py --dry-run || true

# ---- stage C: fused training tables (TIMING: hostloop gate — goes in PERF.md)
if gate hostloop_tf 85 150; then
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
  echo "=== stage C SKIPPED (dispatch/chip sick past deadline) ==="
fi

# ---- stage F: headline bench (bench.py self-gates on its anchor too)
if gate hostloop_tf 85 120; then
  echo "=== stage F: headline bench $(date -u) ==="
  timeout 2400 python bench.py || echo "stage F FAILED"
else
  echo "=== stage F SKIPPED ==="
fi

echo "=== S7 QUEUE COMPLETE $(date -u) ==="
