#!/bin/bash
# Round-3 follow-up TPU queue — starts when the main queue (r3_tpu_queue4)
# exits, runs strictly serialized, deadline-aware.  Stage order is
# irreplaceability-first:
#
#   D2. perceptual-term substitution A/B on the jpeg recipe (VERDICT 5 —
#       the main queue's stage D crashed on the missing post-reset dataset;
#       regenerated deterministically via run_parity --stage data)
#   H.  full_noise BN-recal A/B (the 80-epoch longrun checkpoint never got
#       the A/B the reduced-scale tasks all have)
#   T.  serving tuner sweep (new nhwc_io axis) + headline bench
#   J.  rng A/B confirm (bench.py switched the serving PRNG to rbg)
#   I.  seed reruns for the remaining unexplained losses
#   K.  in-context serving profile at the tuned winner
#   L.  breadth-first seed-rerun top-up until the deadline
#
# Usage: MAIN_PID=<pid> DEADLINE_UTC="21:55" setsid nohup \
#          bash tools/r3_followup.sh > /tmp/r3_followup.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
DEADLINE_UTC=${DEADLINE_UTC:-21:55}
MAIN_PID=${MAIN_PID:-}

now_s()      { date -u +%s; }
deadline_s() { date -u -d "today ${DEADLINE_UTC}" +%s; }
mins_left()  { echo $(( ($(deadline_s) - $(now_s)) / 60 )); }

echo "=== R3 FOLLOWUP START $(date -u) (deadline ${DEADLINE_UTC}Z, $(mins_left) min; waiting on pid ${MAIN_PID}) ==="

if [ -n "${MAIN_PID}" ]; then
  while kill -0 "${MAIN_PID}" 2>/dev/null; do
    if [ "$(mins_left)" -le 10 ]; then
      echo "=== deadline reached while main queue still running; exiting ==="
      exit 0
    fi
    sleep 60
  done
fi
echo "=== main queue done $(date -u) ($(mins_left) min left) ==="

if [ "$(mins_left)" -ge 100 ] && [ ! -f /tmp/parity_r3/jpeg/perceptual_ab.json ]; then
  echo "=== stage D2: perceptual A/B (jpeg) $(date -u) ==="
  timeout 6000 python tools/parity/perceptual_ab.py \
    --workdir /tmp/parity_r3/jpeg || echo "=== stage D2 failed ==="
fi

if [ "$(mins_left)" -ge 45 ] && [ ! -f /tmp/parity_r3/full_noise/recal_ab.json ]; then
  echo "=== stage H: full_noise BN-recal A/B $(date -u) ==="
  timeout 3600 python tools/parity/longrun_recal.py \
    --workdir /tmp/parity_r3/full_noise --task noise \
    || echo "=== stage H failed ==="
fi

if [ "$(mins_left)" -ge 60 ]; then
  echo "=== stage T: serving tuner sweep (adds nhwc_io axis) $(date -u) ==="
  timeout 3600 python benchmarks/tune_serving.py || echo "=== stage T failed ==="
  timeout 1800 python bench.py || echo "=== stage T bench failed ==="
fi

if [ "$(mins_left)" -ge 20 ]; then
  echo "=== stage J: rng A/B confirm $(date -u) ==="
  timeout 1200 python benchmarks/exp_rng.py || echo "=== stage J failed ==="
fi

for task in pixelation_easy high_light; do
  if [ "$(mins_left)" -ge 90 ] && [ ! -f /tmp/parity_r3/${task}/seed_rerun.json ]; then
    echo "=== stage I: ${task} seed rerun $(date -u) ==="
    timeout 5400 python tools/parity/seed_rerun.py \
      --workdir /tmp/parity_r3/${task} --task ${task} --seeds 1337,2024 \
      || echo "=== stage I ${task} failed ==="
  fi
done

if [ "$(mins_left)" -ge 30 ]; then
  echo "=== stage K: in-context serving profile $(date -u) ==="
  timeout 1800 python benchmarks/profile_fast.py || echo "=== stage K failed ==="
fi

if [ "$(mins_left)" -ge 45 ]; then
  echo "=== stage L: breadth-first seed-rerun top-up $(date -u) ==="
  timeout $(( ($(mins_left) - 15) * 60 )) python tools/parity/seed_rerun.py --auto \
    || echo "=== stage L ended (deadline cutoff or failure) ==="
fi

echo "=== R3 FOLLOWUP COMPLETE $(date -u) ($(mins_left) min to deadline) ==="
