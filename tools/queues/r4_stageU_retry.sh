#!/bin/bash
# Re-run the full-color BN-recal A/B (r4 s1 stage U failed on the checkpoint
# name bug fixed in tools/parity/longrun_recal.py).  Waits for the s1 queue's
# TPU stages to finish so the chip stays serialized for timing-free quality
# work only.
# Usage: setsid nohup bash tools/r4_stageU_retry.sh > /tmp/r4_stageU.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
WD=/tmp/parity_r3/full_color
echo "=== stage U retry START $(date -u) ==="
while ! grep -q "TPU stages complete" /tmp/r4_s1_queue.log 2>/dev/null; do
  sleep 120
done
if [ -f "$WD/ours_run.json" ] && [ ! -f "$WD/recal_ab.json" ]; then
  timeout 5400 python tools/parity/longrun_recal.py \
    --workdir "$WD" --task color_distortion || echo "stage U retry FAILED"
else
  echo "nothing to do"
fi
echo "=== stage U retry DONE $(date -u) ==="
