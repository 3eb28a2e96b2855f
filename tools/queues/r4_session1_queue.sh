#!/bin/bash
# Round-4 session-1 chain: recover the two measurement queues the VM reset
# killed at round-3 close (ROADMAP.md "In flight").
#
#   T. full_color ours: 80ep 256x384 b16 on TPU (quality run)
#   U. full_color BN-recal A/B on that checkpoint
#   W. fused-dense training QUALITY A/B (noise 30ep 128x192, off vs on)
#   V. report once the ref side (nice'd CPU, /tmp/full_color_ref.log) lands;
#      snapshot results into tools/parity/results_r3 + commit
#
# Usage: setsid nohup bash tools/r4_session1_queue.sh > /tmp/r4_s1_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
WD=/tmp/parity_r3/full_color
echo "=== R4 S1 QUEUE START $(date -u) ==="

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
      timeout 14400 python tools/parity/run_parity.py \
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

# ---- stage W: fused-dense training quality A/B (noise, 30ep 128x192)
run_ab_side() {  # $1 = workdir, $2 = extra flag ("" or --fused-dense)
  for i in 1 2 3; do
    timeout 10800 python tools/parity/run_parity.py \
      --workdir "$1" --task noise --epochs 30 --batch 16 \
      --height 128 --width 192 --stage data $2 \
    && timeout 10800 python tools/parity/run_parity.py \
      --workdir "$1" --task noise --epochs 30 --batch 16 \
      --height 128 --width 192 --stage ours --ours-tpu $2 && return 0
    echo "=== side $1 attempt $i failed; retrying $(date -u) ==="
    sleep 120
  done
  return 1
}

WOFF=/tmp/parity_r3/fused_ab_off
WON=/tmp/parity_r3/fused_ab_on
if [ ! -f tools/parity/results_r3/fused_dense_quality_ab.json ]; then
  echo "=== stage W: fused off $(date -u) ==="
  [ -f "$WOFF/ours_run.json" ] || run_ab_side "$WOFF" "" || echo "stage W off-side FAILED"
  echo "=== stage W: fused on $(date -u) ==="
  [ -f "$WON/ours_run.json" ] || run_ab_side "$WON" "--fused-dense" || echo "stage W on-side FAILED"

  python - <<'EOF'
import json, os, sys
sys.path.insert(0, "/root/repo/tools/parity")
from run_parity import extract_metrics
out = {"task": "noise", "epochs": 30, "batch": 16, "hw": [128, 192],
       "protocol": "same dataset+seed, ours-side only, TPU bf16"}
for name, wd in (("fused_off", "/tmp/parity_r3/fused_ab_off"),
                 ("fused_on", "/tmp/parity_r3/fused_ab_on")):
    try:
        run_dir = json.load(open(os.path.join(wd, "ours_run.json")))["run_dir"]
        out[name] = extract_metrics(run_dir)
    except Exception as e:
        out[name] = {"error": f"{type(e).__name__}: {e}"}
os.makedirs("tools/parity/results_r3", exist_ok=True)
with open("tools/parity/results_r3/fused_dense_quality_ab.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
EOF
  git add tools/parity/results_r3/fused_dense_quality_ab.json 2>/dev/null \
    && git commit -q -m "Snapshot fused-dense training quality A/B (auto)" \
    && echo "fused A/B snapshot committed" || echo "nothing to commit"
fi
echo "=== TPU stages complete $(date -u) ==="

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
echo "=== R4 S1 QUEUE COMPLETE $(date -u) ==="
