#!/bin/bash
# Round-3 stage A: serialized TPU perf measurements (run BEFORE the long
# parity queue so their results can inform code changes during the round).
#   1. serving bf16-act A/B (flip _DB_BF16_ACT default if it wins)
#   2. training-step table: canonical vs fused DenseBlocks at the reference
#      recipe shape b16 256x384 (VERDICT r2 item 2 "Done" criterion)
#   3. large-batch fused training: b128 256x256, then the b256 OOM frontier
#   4. eval-path wall-clock: async writer pool vs synchronous (item 7)
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
echo "--- 1. serving variant sweep (bf16-act x K-stack) + persist winner ---"
retry timeout 7200 python benchmarks/tune_serving.py

echo "--- 2. train table b16 256x384 ---"
retry timeout 5400 python benchmarks/profile_train.py --only \
"train step (fwd+bwd+adam+synth),train step (fused DenseBlocks),train step (fused + remat)"

echo "--- 2b. fused train with K-stacked growth forward ---"
retry timeout 5400 python benchmarks/profile_train.py --k-stack 48 --only \
"train step (fused DenseBlocks)"

echo "--- 3a. fused training b128 256x256 ---"
retry timeout 5400 python benchmarks/profile_train.py --batch 128 --height 256 --width 256 --only \
"train step (per-block remat),train step (fused DenseBlocks),train step (fused + remat)"

echo "--- 3b. fused training b256 256x256 (OOM frontier) ---"
timeout 5400 python benchmarks/profile_train.py --batch 256 --height 256 --width 256 --only \
"train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "[stageA] b256 probe failed (OOM is an acceptable answer)"

echo "--- 4. eval wall-clock (writer pool A/B) ---"
retry timeout 3600 python benchmarks/eval_wallclock.py --n 128 --batch 32

echo "=== STAGE A DONE $(date) ==="
