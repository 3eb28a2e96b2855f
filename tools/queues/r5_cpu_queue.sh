#!/bin/bash
# Round-4 session-7 CPU chain: restart the torch reference full-scale
# color_distortion run (80ep 256x384 b16, ~10 h nice'd CPU) that the 8/20
# VM reset killed, then assemble the full-color parity report from its
# metrics + the already-committed ours-side eval
# (tools/parity/results_r3/full_color_recal_ab.json stock row — the TPU
# run landed and was snapshotted before the reset; only its /tmp run dir
# was lost).
#
# Holds until the TPU queue's pipeline-bench stage (P) finishes so the
# bench window stays uncontended.
#
# Usage: setsid nohup bash tools/r5_cpu_queue.sh > /root/scratch/r5_cpu_queue.log 2>&1 &
set -u
cd /root/repo
WD=/root/scratch/parity_r3/full_color
mkdir -p /root/scratch/markers
echo "=== R5 CPU QUEUE START $(date -u) ==="

t0=$(date +%s)
while [ ! -f /root/scratch/markers/stageP.done ]; do
  [ $(( $(date +%s) - t0 )) -ge 5400 ] && { echo "stage P wait timed out; starting anyway"; break; }
  sleep 120
done
echo "=== bench window clear; starting ref run $(date -u) ==="

if [ ! -f "$WD/ref_run.json" ]; then
  nice -n 10 timeout 64800 python tools/parity/run_parity.py \
    --workdir "$WD" --task color_distortion \
    --epochs 80 --batch 16 --height 256 --width 384 --stage ref \
    && echo "=== ref run DONE $(date -u) ===" \
    || echo "=== ref run FAILED $(date -u) ==="
fi

# ---- report: ref metrics from the fresh run, ours from the committed
# full-scale eval (the run dir was reset-wiped; the recal A/B snapshot
# carries the stock PSNR/SSIM of the same checkpoint+eval).
if [ -f "$WD/ref_run.json" ]; then
  python - <<'EOF'
import json, os, sys
sys.path.insert(0, "tools/parity")
from run_parity import extract_metrics
wd = "/root/scratch/parity_r3/full_color"
ref_run = json.load(open(os.path.join(wd, "ref_run.json")))["run_dir"]
ref_m = extract_metrics(ref_run)
ab = json.load(open("tools/parity/results_r3/full_color_recal_ab.json"))
ours_m = ab["stock"]
result = {
    "reference": ref_m,
    "ours": ours_m,
    "ours_bn_recal": ab["bn_recal"],
    "delta_psnr_db": ours_m["psnr"] - ref_m["psnr"],
    "delta_ssim": ours_m["ssim"] - ref_m["ssim"],
    "task": "color_distortion",
    "epochs": 80,
    "resolution": [256, 384],
    "batch": 16,
    "note": ("ours-side metrics recovered from the committed recal-A/B "
             "snapshot; its /tmp run dir was lost to the 8/20 VM reset"),
    "ref_run": ref_run,
}
out = "tools/parity/results_r3/full_color_parity.json"
json.dump(result, open(out, "w"), indent=2)
print(json.dumps(result, indent=2))
EOF
  git add tools/parity/results_r3/full_color_parity.json 2>/dev/null \
    && git commit -q -m "Full-scale color_distortion parity: torch ref run landed (auto)" \
    && echo "report committed" || echo "nothing to commit"
fi
echo "=== R5 CPU QUEUE COMPLETE $(date -u) ==="
