#!/bin/bash
# Round-3 TPU queue, day-2 (post VM reset) — strictly serialized, deadline-
# aware.  Assumes tools/parity/restore_r3.py already rebuilt /tmp/parity_r3
# from the committed snapshot (idempotent skip logic depends on it).
#
# Stage order = irreplaceability per remaining gap:
#   B. color_distortion ours (the one reduced-scale task still unmeasured)
#   C. full_noise longrun ours: noise 80ep 256x384 b16 (VERDICT 4)
#   E. classifier at reference scale (VERDICT 6)
#   D. perceptual-term substitution A/B on the jpeg recipe (VERDICT 5)
#   F. training-step tables incl. fused/K-stack variants (VERDICT 2)
#   G. eval wall-clock + headline bench for the record
#   B3. seed-variance reruns, breadth-first, until the deadline cutoff
#
# Usage: DEADLINE_UTC="22:20" setsid nohup bash tools/r3_tpu_queue3.sh \
#          > /tmp/r3_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
DEADLINE_UTC=${DEADLINE_UTC:-22:20}

now_s()      { date -u +%s; }
deadline_s() { date -u -d "today ${DEADLINE_UTC}" +%s; }
mins_left()  { echo $(( ($(deadline_s) - $(now_s)) / 60 )); }

echo "=== R3 QUEUE-3 START $(date -u) (deadline ${DEADLINE_UTC}Z, $(mins_left) min) ==="

python tools/parity/restore_r3.py --root /tmp/parity_r3 || true

if [ "$(mins_left)" -ge 40 ]; then
  echo "=== stage B: color_distortion ours $(date -u) ==="
  timeout 5400 python -u tools/parity/ours_r3.py --root /tmp/parity_r3 \
    --tasks color_distortion || echo "=== stage B failed ==="
fi

if [ "$(mins_left)" -ge 90 ]; then
  echo "=== stage C: full_noise longrun ours (80ep 256x384 b16) $(date -u) ==="
  if [ ! -f /tmp/parity_r3/full_noise/ours_run.json ]; then
    for i in 1 2 3; do
      timeout 7200 python tools/parity/run_parity.py \
        --workdir /tmp/parity_r3/full_noise --task noise \
        --epochs 80 --batch 16 --height 256 --width 384 \
        --stage ours --ours-tpu && break
      echo "=== stage C attempt $i failed; retrying $(date -u) ==="
      sleep 60
    done
  else
    echo "stage C already complete"
  fi
fi

if [ "$(mins_left)" -ge 120 ]; then
  echo "=== stage E: classifier at reference scale (synthetic) $(date -u) ==="
  if [ ! -f runs_classifier/r3_scale/summary.json ]; then
    for i in 1 2; do
      timeout 10800 python -m multi_degradation_image_enhancement_tpu.classification.train \
        --synthetic --synthetic_images 500 --synthetic_variants 5 \
        --epochs 30 --batch_size 32 --bn_recal_passes 3 \
        --run_dir runs_classifier/r3_scale && break
      echo "=== stage E attempt $i failed; retrying $(date -u) ==="
      sleep 60
    done
  else
    echo "stage E already complete"
  fi
fi

if [ "$(mins_left)" -ge 90 ]; then
  echo "=== stage D: perceptual A/B (jpeg) $(date -u) ==="
  if [ ! -f /tmp/parity_r3/jpeg/perceptual_ab.json ]; then
    timeout 7200 python tools/parity/perceptual_ab.py \
      --workdir /tmp/parity_r3/jpeg || echo "=== stage D failed ==="
  else
    echo "stage D already complete"
  fi
fi

if [ "$(mins_left)" -ge 60 ]; then
  echo "=== stage F: training-step tables $(date -u) ==="
  timeout 3600 python benchmarks/profile_train.py --only \
  "train step (fwd+bwd+adam+synth),train step (fused DenseBlocks),train step (fused + remat)" \
    || echo "stage F base table FAILED"
  timeout 2700 python benchmarks/profile_train.py --k-stack 48 --only \
  "train step (fused DenseBlocks)" || echo "stage F k-stack FAILED"
  timeout 2700 python benchmarks/profile_train.py --batch 128 --height 256 --width 256 --only \
  "train step (per-block remat),train step (fused DenseBlocks),train step (fused + remat)" \
    || echo "stage F b128 FAILED"
  timeout 2700 python benchmarks/profile_train.py --batch 256 --height 256 --width 256 --only \
  "train step (fused DenseBlocks),train step (fused + remat)" \
    || echo "stage F b256 probe failed (OOM is an acceptable answer)"
fi

if [ "$(mins_left)" -ge 45 ]; then
  echo "=== stage G: eval wall-clock + headline bench $(date -u) ==="
  timeout 2400 python benchmarks/eval_wallclock.py --n 128 --batch 32 \
    || echo "stage G eval_wallclock FAILED"
  timeout 1800 python bench.py || echo "stage G bench FAILED"
fi

# B3 absorbs whatever window remains, breadth-first (one variant per losing
# task per cycle), stopping 35 min before the deadline.
M=$(mins_left)
if [ "$M" -ge 55 ]; then
  echo "=== stage B3: seed-variance reruns (window $((M - 35)) min) $(date -u) ==="
  timeout $(( (M - 35) * 60 )) python -u tools/parity/seed_rerun.py \
    --root /tmp/parity_r3 --auto || echo "=== stage B3 timed out / failed ==="
fi

echo "=== R3 QUEUE-3 COMPLETE $(date -u) ($(mins_left) min to deadline) ==="
