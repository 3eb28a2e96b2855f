#!/bin/bash
# Round-5 TPU chain #4: corrected healthy-window bench watchdog (the r13
# gate lacked pipefail, so its "healthy" branch fired on a degraded
# window).  Waits for r14, then probes every 8 min until the anchor reads
# >=95 TF/s or 03:35 UTC; a healthy window immediately takes a full bench
# and commits the snapshot.  Exits quietly either way so the driver gets
# an idle chip.
# Usage: setsid nohup bash tools/queues/r15_tpu_queue.sh > /root/scratch/r15_tpu_queue.log 2>&1 &
set -u
set -o pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/scratch/jaxcache
RES=tools/parity/results_r3
END=$(date -u -d "03:35" +%s); NOW=$(date -u +%s)
[ $((END - NOW)) -lt 0 ] && END=$(date -u -d "03:35 next day" +%s)
echo "=== R15 WATCHDOG START $(date -u) (until $(date -u -d @$END)) ==="
for i in $(seq 1 300); do
  [ -f /root/scratch/markers/r14_done ] && break
  [ "$(date -u +%s)" -ge "$END" ] && break
  sleep 60
done
echo "=== window open $(date -u) ==="
while [ "$(date -u +%s)" -lt "$END" ]; do
  if timeout 300 python tools/probe_anchor.py --min-tflops 95 2>/dev/null \
     | tee -a /root/scratch/anchor_probes_r15.log; then
    echo "=== healthy window $(date -u); running bench ==="
    BENCH_BUDGET_S=1200 timeout 1260 python bench.py \
      2> /root/scratch/bench_r5_healthy2.err | tee /root/scratch/bench_r5_healthy2.json
    if [ -s /root/scratch/bench_r5_healthy2.json ]; then
      cp /root/scratch/bench_r5_healthy2.json "$RES/bench_r5_window.json"
      git add "$RES/bench_r5_window.json" \
        && git commit -q -m "Round-5 healthy-window bench snapshot (anchor-gated; auto)" || true
    fi
    break
  fi
  sleep 480
done
echo "=== R15 WATCHDOG COMPLETE $(date -u) ==="
