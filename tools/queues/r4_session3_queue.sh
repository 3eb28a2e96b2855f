#!/bin/bash
# Round-4 session-3 chain: serving-perf measurements, serialized behind the
# quality queues (stage U recal + s2 full-noise seed rerun hold the chip).
#
#   A. fused hardware-PRNG noise kernel A/B (+persist fused_noise knob)
#   B. tune_serving sweep incl. the untested k_stack 56/64 combos (persists)
#   C. bench.py headline with the persisted knobs -> /tmp/r4_bench_tuned.json
#
# Usage: setsid nohup bash tools/r4_session3_queue.sh > /tmp/r4_s3_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
echo "=== R4 S3 QUEUE START $(date -u) ==="

# ---- wait for the chip: stage U (recal) + s2 stage Y (seed rerun) ----
# (pgrep is read-only here; we never kill by pattern)
while pgrep -f "longrun_recal.py|recalibrate_bn.py|seed_rerun.py" >/dev/null; do
  sleep 180
done
echo "=== chip free $(date -u) ==="

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

t0=$(date +%s)
while :; do
  tf=$(compute_tf | tail -1)
  echo "GATE[compute_tf] ${tf:-probe-failed} (need >= 55) $(date -u)"
  awk -v a="${tf:-0}" 'BEGIN{exit !(a+0>=55)}' && break
  if [ $(( $(date +%s) - t0 )) -ge 7200 ]; then
    echo "=== compute gate: 2h deadline hit; proceeding anyway (labeled) ==="
    break
  fi
  sleep 300
done

echo "=== stage A: tune_serving sweep (k_stack 56/64 gap) $(date -u) ==="
timeout 10800 python benchmarks/tune_serving.py 2>&1 | grep -v WARNING \
  || echo "stage A FAILED"

echo "=== stage B: noise kernel A/B $(date -u) ==="
timeout 5400 python benchmarks/exp_noise_kernel.py --persist \
  2>&1 | grep -v WARNING || echo "stage B FAILED"

echo "=== stage C: bench headline $(date -u) ==="
timeout 3600 python bench.py > /tmp/r4_bench_tuned.json 2>/tmp/r4_bench_tuned.err \
  || echo "stage C FAILED"
cat /tmp/r4_bench_tuned.json

git add multi_degradation_image_enhancement_tpu/config/serving_tuning.json 2>/dev/null \
  && git commit -q -m "Persist measured serving-tuning winners (noise kernel A/B + k-stack gap sweep)" \
  && echo "tuning snapshot committed" || echo "nothing to commit"
echo "=== R4 S3 QUEUE COMPLETE $(date -u) ==="
