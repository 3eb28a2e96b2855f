#!/bin/bash
# Eighth link in the session-3 serialized TPU chain: fused training tables,
# attempt 3 — the queue-D runs imported the pre-cmpf-fix module.  Gates on
# the sanity anchor first: the chip measured ~53 TF/s (half speed) around
# 00:00Z, which depresses every timing; wait for ≥85 TF/s before timing,
# up to 90 min, then measure anyway and label the anchor.
# Usage: QUEUE_PID=<pid of queue_g> setsid nohup bash tools/r3_session3_queue_h.sh > /tmp/r3_s3_queue_h.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
QUEUE_PID=${QUEUE_PID:-}

if [ -n "${QUEUE_PID}" ]; then
  while kill -0 "${QUEUE_PID}" 2>/dev/null; do sleep 60; done
fi
echo "=== S3 QUEUE H START $(date -u) ==="

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

for i in $(seq 1 18); do
  if anchor 2>/dev/null | grep ANCHOR; then break; fi
  echo "=== anchor below 85 TF/s, waiting ($i/18) $(date -u) ==="
  sleep 300
done

echo "=== stage F3: fused training tables $(date -u) ==="
timeout 5400 python benchmarks/profile_train.py --only \
"train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage F3 base FAILED"
timeout 5400 python benchmarks/profile_train.py --k-stack 48 --only \
"train step (fused DenseBlocks)" || echo "stage F3 k-stack FAILED"
timeout 5400 python benchmarks/profile_train.py --batch 128 --height 256 --width 256 --only \
"train step (per-block remat),train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage F3 b128 FAILED"
timeout 5400 python benchmarks/profile_train.py --batch 256 --height 256 --width 256 --only \
"train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage F3 b256 probe failed (OOM is an acceptable answer)"

echo "=== stage H2: final headline bench (anchor-gated) $(date -u) ==="
timeout 2400 python bench.py || echo "stage H2 FAILED"

echo "=== S3 QUEUE H COMPLETE $(date -u) ==="
