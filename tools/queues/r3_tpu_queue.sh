#!/bin/bash
# Round-3 master TPU queue — strictly serialized (one TPU process at a time;
# concurrent TPU procs corrupt each other's numbers AND trip the axon
# backend's flaky init).  Run AFTER any other TPU user has exited:
#   nohup bash tools/r3_tpu_queue.sh > /tmp/r3_queue.log 2>&1 &
#
# Stage order = irreplaceability under a flaky tunnel (each stage is
# idempotent / skip-complete):
#   C. full-recipe longrun ours: noise 80ep 256x384 b16 (VERDICT 4)
#   B. remaining reduced-scale parity ours runs + BN-recal A/Bs (VERDICT 3)
#      — walked REVERSED relative to the CPU fallback chain; ours_r3.py's
#      activity detection skips tasks the other worker is training.
#   D. perceptual-term substitution A/B on the jpeg recipe (VERDICT 5)
#   E. classifier at reference scale, on-device synthetic (VERDICT 6)
#   F. training-step tables incl. fused/K-stack variants (VERDICT 2)
#   G. eval wall-clock (writer pool A/B) + headline bench for the record
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

echo "=== R3 QUEUE START $(date) ==="

echo "=== stage C: full_noise longrun ours (80ep 256x384 b16) $(date) ==="
if [ ! -f /tmp/parity_r3/full_noise/ours_run.json ]; then
  for i in 1 2 3; do
    timeout 14400 python tools/parity/run_parity.py \
      --workdir /tmp/parity_r3/full_noise --task noise \
      --epochs 80 --batch 16 --height 256 --width 384 \
      --stage ours --ours-tpu && break
    echo "=== stage C attempt $i failed; retrying $(date) ==="
    sleep 60
  done
else
  echo "stage C already complete"
fi

echo "=== stage B: parity ours (reduced-scale tasks, reversed) $(date) ==="
# The CPU fallback chain launched before the activity-claim code landed, so
# it cannot see TPU-active tasks.  Once the TPU owns the queue, retire the
# CPU chain (driver + descendants, by recorded pid tree — never by pattern);
# the TPU side redoes its interrupted task in ~20 min.
if [ -f /tmp/ours_cpu_chain.pid ]; then
  P=$(cat /tmp/ours_cpu_chain.pid)
  if kill -0 "$P" 2>/dev/null; then
    DESC="$P"
    for c in $(ps -o pid= --ppid "$P"); do
      DESC="$DESC $c $(ps -o pid= --ppid "$c" | tr '\n' ' ')"
    done
    echo "retiring CPU parity chain pids: $DESC"
    kill $DESC 2>/dev/null
    sleep 5
    kill -9 $DESC 2>/dev/null
  fi
fi
python -u tools/parity/ours_r3.py --root /tmp/parity_r3 \
  --tasks color_distortion,low_contrast,high_light,motion_blur,pixelation_easy,pixelation,jpeg \
  || echo "=== stage B had failures (see above) ==="
# Second pass after the activity-freshness window: catches a task whose
# files the just-killed CPU run touched (ours_r3 skips "active" workdirs
# for 15 min) — idempotent, completed tasks skip instantly.
sleep 900
python -u tools/parity/ours_r3.py --root /tmp/parity_r3 \
  --tasks color_distortion,low_contrast,high_light,motion_blur,pixelation_easy,pixelation,jpeg \
  || echo "=== stage B second pass had failures ==="

echo "=== stage B3: seed-variance reruns for any task ours lost $(date) ==="
# 3 losing tasks x (2 seeds + torch_init A/B) at ~25 min/run on TPU
timeout 21600 python -u tools/parity/seed_rerun.py --root /tmp/parity_r3 --auto \
  || echo "=== stage B3 had failures ==="

echo "=== stage B4: paired per-image checkpoint evals (CPU-hermetic) $(date) ==="
for t in jpeg pixelation pixelation_easy pixelation_hard motion_blur high_light low_contrast color_distortion; do
  if [ -f /tmp/parity_r3/$t/ours_run.json ] && [ ! -f /tmp/parity_r3/$t/paired_eval.json ]; then
    timeout 1800 python tools/parity/paired_eval.py \
      --workdir /tmp/parity_r3/$t --task $t || echo "paired_eval $t FAILED"
  fi
done
if [ -f /tmp/parity_r3/full_noise/ours_run.json ] && [ ! -f /tmp/parity_r3/full_noise/paired_eval.json ]; then
  timeout 3600 python tools/parity/paired_eval.py \
    --workdir /tmp/parity_r3/full_noise --task noise || echo "paired_eval full_noise FAILED"
fi

echo "=== stage D: perceptual A/B (jpeg) $(date) ==="
if [ ! -f /tmp/parity_r3/jpeg/perceptual_ab.json ]; then
  for i in 1 2 3; do
    timeout 7200 python tools/parity/perceptual_ab.py \
      --workdir /tmp/parity_r3/jpeg && break
    echo "=== stage D attempt $i failed; retrying $(date) ==="
    sleep 60
  done
else
  echo "stage D already complete"
fi

echo "=== stage E: classifier at reference scale (synthetic) $(date) ==="
if [ ! -f runs_classifier/r3_scale/summary.json ]; then
  for i in 1 2 3; do
    timeout 10800 python -m multi_degradation_image_enhancement_tpu.classification.train \
      --synthetic --synthetic_images 500 --synthetic_variants 5 \
      --epochs 30 --batch_size 32 --bn_recal_passes 3 \
      --run_dir runs_classifier/r3_scale && break
    echo "=== stage E attempt $i failed; retrying $(date) ==="
    sleep 60
  done
else
  echo "stage E already complete"
fi

echo "=== stage F: training-step tables $(date) ==="
timeout 5400 python benchmarks/profile_train.py --only \
"train step (fwd+bwd+adam+synth),train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage F base table FAILED"
timeout 5400 python benchmarks/profile_train.py --k-stack 48 --only \
"train step (fused DenseBlocks)" || echo "stage F k-stack FAILED"
timeout 5400 python benchmarks/profile_train.py --batch 128 --height 256 --width 256 --only \
"train step (per-block remat),train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage F b128 FAILED"
timeout 5400 python benchmarks/profile_train.py --batch 256 --height 256 --width 256 --only \
"train step (fused DenseBlocks),train step (fused + remat)" \
  || echo "stage F b256 probe failed (OOM is an acceptable answer)"

echo "=== stage G: eval wall-clock + headline bench $(date) ==="
timeout 3600 python benchmarks/eval_wallclock.py --n 128 --batch 32 \
  || echo "stage G eval_wallclock FAILED"
timeout 2400 python bench.py || echo "stage G bench FAILED"
timeout 2400 python benchmarks/exp_int8_reprobe.py \
  || echo "stage G int8 reprobe FAILED"

echo "=== R3 QUEUE COMPLETE $(date) ==="
