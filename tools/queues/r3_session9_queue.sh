#!/bin/bash
# Session-9 chain: the full-scale color_distortion A/B (the one open parity
# row — PARITY.md attributes the reduced-scale ~1.0 dB mean deficit to
# trajectory quality; this measures whether it survives the reference's own
# full recipe, as the noise longrun's deficit did not).
#
#   T. full_color ours: 80ep 256x384 b16 on TPU (waits for s8 to finish)
#   U. full_color BN-recal A/B on that checkpoint (recal was a no-op at
#      reduced scale, -0.02 dB; measure at full scale anyway)
#   V. report stage once the ref side (nice'd CPU, ~10 h, /tmp/full_color_ref.log)
#      completes; snapshot results into tools/parity/results_r3 + commit
#
# Usage: setsid nohup bash tools/r3_session9_queue.sh > /tmp/r3_s9_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
WD=/tmp/parity_r3/full_color
echo "=== S9 QUEUE START $(date -u) ==="

S8_LOG=/tmp/r3_s8_queue.log
while [ -f "$S8_LOG" ] && ! grep -q "S8 QUEUE COMPLETE" "$S8_LOG"; do
  sleep 180
done
echo "=== s8 complete; TPU free $(date -u) ==="

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

gate() {
  local thr=$1 deadline_min=$2 t0 tf
  t0=$(date +%s)
  while :; do
    tf=$(compute_tf | tail -1)
    echo "GATE[compute_tf] ${tf:-probe-failed} (need >= $thr) $(date -u)"
    awk -v a="${tf:-0}" -v t="$thr" 'BEGIN{exit !(a+0>=t+0)}' && return 0
    if [ $(( $(date +%s) - t0 )) -ge $(( deadline_min * 60 )) ]; then
      echo "=== gate $thr: deadline ${deadline_min}m hit ==="
      return 1
    fi
    sleep 300
  done
}

# ---- stage T: full_color ours (quality run — compute gate only)
if gate 35 120; then
  echo "=== stage T: full_color ours 80ep 256x384 b16 $(date -u) ==="
  if [ ! -f "$WD/ours_run.json" ]; then
    for i in 1 2 3; do
      timeout 10800 python tools/parity/run_parity.py \
        --workdir "$WD" --task color_distortion \
        --epochs 80 --batch 16 --height 256 --width 384 \
        --stage ours --ours-tpu && break
      echo "=== stage T attempt $i failed; retrying $(date -u) ==="
      sleep 60
    done
  else
    echo "stage T already complete"
  fi
else
  echo "=== stage T SKIPPED (compute sick past deadline) ==="
fi

# ---- stage U: BN-recal A/B on the full_color checkpoint
if [ -f "$WD/ours_run.json" ] && [ ! -f "$WD/recal_ab.json" ]; then
  echo "=== stage U: full_color recal A/B $(date -u) ==="
  timeout 5400 python tools/parity/longrun_recal.py \
    --workdir "$WD" --task color_distortion || echo "stage U FAILED"
fi

# ---- stage V: report once the ref side lands (poll up to 12 h)
echo "=== stage V: waiting for ref side $(date -u) ==="
t0=$(date +%s)
while [ ! -f "$WD/ref_run.json" ]; do
  if [ $(( $(date +%s) - t0 )) -ge $(( 12 * 3600 )) ]; then
    echo "=== ref side never landed within 12 h; skipping report ==="
    exit 0
  fi
  sleep 600
done
echo "=== ref side landed $(date -u) ==="
python tools/parity/run_parity.py --workdir "$WD" --task color_distortion \
  --epochs 80 --batch 16 --height 256 --width 384 --stage report \
  > "$WD/report.json" 2>/tmp/full_color_report.err \
  || echo "stage V report FAILED"
mkdir -p tools/parity/results_r3
[ -f "$WD/report.json" ] && cp "$WD/report.json" \
  tools/parity/results_r3/full_color_parity.json
[ -f "$WD/recal_ab.json" ] && cp "$WD/recal_ab.json" \
  tools/parity/results_r3/full_color_recal_ab.json
git add tools/parity/results_r3/full_color_*.json 2>/dev/null \
  && git commit -q -m "Snapshot full-scale color_distortion parity artifacts (auto)" \
  && echo "snapshot committed" || echo "nothing to commit"
echo "=== S9 QUEUE COMPLETE $(date -u) ==="
