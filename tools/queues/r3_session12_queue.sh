#!/bin/bash
# Session-12 chain: the deferred full-scale color_distortion stages.
#
# Stage T is a ~3 h quality run; the round-3 driver bench fires ~19:30 UTC
# and must see an idle chip, so this queue sleeps until 21:00 UTC before
# starting.  Stages T/U/V are unchanged from the s10/s11 queues.
#
# Usage: setsid nohup bash tools/r3_session12_queue.sh > /tmp/r3_s12_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
WD=/tmp/parity_r3/full_color
echo "=== S12 QUEUE START $(date -u) ==="

# hold until 21:00 UTC so the end-of-round driver bench gets an idle chip
while [ "$(date -u +%s)" -lt "$(date -u -d '21:00' +%s)" ]; do
  sleep 120
done
echo "=== hold released $(date -u) ==="

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
if gate 35 180; then
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
echo "=== S12 QUEUE COMPLETE $(date -u) ==="
