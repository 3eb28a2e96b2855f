#!/bin/bash
# Session-8 chain: the fused-training tables via the scan-chained profiler
# (immune to the degraded tunnel RTT), then the host-loop stages if/when
# dispatch heals.  Takes over from session-7 at its first hostloop gate:
# s7's quality stages (D/E/G) must finish first; its C/F stages are
# superseded by this queue (same measurements, RTT-robust path first).
# Usage: setsid nohup bash tools/r3_session8_queue.sh > /tmp/r3_s8_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
echo "=== S8 QUEUE START $(date -u) ==="

S7_LOG=/tmp/r3_s7_queue.log
# wait until s7 leaves its quality stages: first hostloop gate probe, or done
while [ -f "$S7_LOG" ] \
      && ! grep -q "GATE\[hostloop_tf\]\|S7 QUEUE COMPLETE" "$S7_LOG"; do
  sleep 120
done
# stop s7 (its remaining stages C/F are superseded here); exact-PID kill only
for p in /proc/[0-9]*/cmdline; do
  c=$(tr '\0' ' ' < "$p" 2>/dev/null)
  case "$c" in
    "bash tools/r3_session7_queue.sh "*|"bash tools/r3_session7_queue.sh")
      pid=$(basename "$(dirname "$p")")
      echo "stopping s7 pid $pid"; kill "$pid" 2>/dev/null ;;
  esac
done
sleep 5
echo "=== s7 handed off $(date -u) ==="

compute_tf() {
  timeout 600 python - <<'EOF' 2>/dev/null
import time, jax, jax.numpy as jnp
a = jnp.ones((4096,4096), jnp.bfloat16)
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

# ---- stage S: scan-mode fused training tables (compute gate — RTT-immune)
if gate compute_tf 35 60; then
  echo "=== stage S: scan training tables b16 256x384 $(date -u) ==="
  timeout 9000 python benchmarks/profile_train_scan.py \
    --batch 16 --height 256 --width 384 || echo "stage S base FAILED"
  echo "=== stage S: k-stack A/B $(date -u) ==="
  timeout 5400 python benchmarks/profile_train_scan.py \
    --batch 16 --height 256 --width 384 --k-stack 48 --only fused \
    || echo "stage S k-stack FAILED"
  echo "=== stage S: b128 256x256 $(date -u) ==="
  timeout 9000 python benchmarks/profile_train_scan.py \
    --batch 128 --height 256 --width 256 --only "remat,fused,fused+remat" \
    || echo "stage S b128 FAILED"
  echo "=== stage S: b256 256x256 memory probe $(date -u) ==="
  timeout 5400 python benchmarks/profile_train_scan.py \
    --batch 256 --height 256 --width 256 --n1 2 --n2 4 \
    --only "fused+remat" || echo "stage S b256 probe failed (OOM acceptable)"
else
  echo "=== stage S SKIPPED (compute sick past deadline) ==="
fi

# ---- stage C: host-loop training tables (timing cross-check, needs RTT healthy)
if gate hostloop_tf 85 90; then
  echo "=== stage C: host-loop training tables $(date -u) ==="
  timeout 5400 python benchmarks/profile_train.py --only \
"train step (per-block remat),train step (fused DenseBlocks),train step (fused + remat)" \
    || echo "stage C FAILED"
else
  echo "=== stage C SKIPPED (dispatch sick past deadline) ==="
fi

# ---- stage F: headline bench (self-gates on its anchor too)
if gate hostloop_tf 85 90; then
  echo "=== stage F: headline bench $(date -u) ==="
  timeout 2400 python bench.py || echo "stage F FAILED"
else
  echo "=== stage F SKIPPED ==="
fi

echo "=== S8 QUEUE COMPLETE $(date -u) ==="
