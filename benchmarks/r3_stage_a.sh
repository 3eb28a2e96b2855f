#!/bin/bash
# Round-3 stage A (run first when the TPU tunnel heals): the serving
# variant sweep — it persists the measured-best kernel combo to
# config/serving_tuning.json, which the production serving path and
# bench.py load at import.  Everything else (longrun, parity, classifier,
# training tables) lives in tools/r3_tpu_queue.sh, ordered by
# irreplaceability in case the tunnel flaps again.
# Usage: nohup bash benchmarks/r3_stage_a.sh > /tmp/r3_stage_a.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

retry() {
  for i in 1 2 3; do
    "$@" && return 0
    echo "[stageA] attempt $i failed: $*" >&2
    sleep 60
  done
  echo "[stageA] GAVE UP: $*" >&2
  return 1
}

echo "=== STAGE A START $(date) ==="
echo "--- serving variant sweep (bf16-act x K-stack) + persist winner ---"
retry timeout 10800 python benchmarks/tune_serving.py
echo "=== STAGE A DONE $(date) ==="
