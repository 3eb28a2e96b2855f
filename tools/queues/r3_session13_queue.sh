#!/bin/bash
# Session-13 chain: fused-training QUALITY A/B (the measurement that decides
# whether `train.fused_dense` becomes a shipped default — PERF.md 3g).
#
#   W. noise task, 30 epochs, 128x192, b16, same dataset + seed, ours-side
#      only, fused_dense off vs on; writes
#      tools/parity/results_r3/fused_dense_quality_ab.json and auto-commits.
#
# Runs after the s12 queue (full-scale color stages) releases the chip.
# Usage: setsid nohup bash tools/r3_session13_queue.sh > /tmp/r3_s13_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache
S12_PID="${S12_PID:-13217}"
echo "=== S13 QUEUE START $(date -u) (waiting on s12 pid $S12_PID) ==="

while kill -0 "$S12_PID" 2>/dev/null \
      && ! grep -q "S12 QUEUE COMPLETE" /tmp/r3_s12_queue.log 2>/dev/null; do
  sleep 300
done
echo "=== s12 done; TPU free $(date -u) ==="

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
echo "=== stage W: fused off $(date -u) ==="
run_ab_side "$WOFF" "" || echo "stage W off-side FAILED"
echo "=== stage W: fused on $(date -u) ==="
run_ab_side "$WON" "--fused-dense" || echo "stage W on-side FAILED"

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
  && echo "snapshot committed" || echo "nothing to commit"
echo "=== S13 QUEUE COMPLETE $(date -u) ==="
