#!/bin/bash
# Round-4 session-5 chain: full-scale noise seed matrix completion.
# The s2 fresh-seed run landed 24.82 dB stock (seed 42: 25.64) — a 0.83 dB
# full-scale spread that needs (a) the recal A/B on the new checkpoint and
# (b) a third seed to bracket the mean before PARITY.md's longrun claim is
# restated.
#
#   R. BN-recal A/B on the seed-1337 checkpoint
#   S. seed-2024 ours run (80ep 256x384 b16, stock)
#   T. BN-recal A/B on the seed-2024 checkpoint
#   then snapshot + commit.
#
# Usage: setsid nohup bash tools/r4_session5_queue.sh > /tmp/r4_s5_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
WD=/tmp/parity_r3/full_noise
echo "=== R4 S5 QUEUE START $(date -u) ==="

while ! grep -q "R4 S4 QUEUE COMPLETE" /tmp/r4_s4_queue.log 2>/dev/null; do
  sleep 300
done
echo "=== s4 done; chip free $(date -u) ==="

echo "=== stage R: recal A/B on seed-1337 ckpt $(date -u) ==="
[ -f "$WD/recal_ab_seed1337.json" ] || timeout 5400 python tools/parity/longrun_recal.py \
  --workdir "$WD" --task noise --suffix _seed1337 || echo "stage R FAILED"

echo "=== stage S: seed-2024 full-scale run $(date -u) ==="
timeout 14400 python tools/parity/seed_rerun.py --workdir "$WD" --task noise \
  --seeds 2024 --no-torch-init-ab || echo "stage S FAILED"

echo "=== stage T: recal A/B on seed-2024 ckpt $(date -u) ==="
if [ -d "$WD/ours_seed2024" ]; then
  timeout 5400 python tools/parity/longrun_recal.py \
    --workdir "$WD" --task noise --suffix _seed2024 || echo "stage T FAILED"
fi

cp "$WD/seed_rerun.json" tools/parity/results_r3/full_noise_seed_rerun.json 2>/dev/null
for s in 1337 2024; do
  [ -f "$WD/recal_ab_seed$s.json" ] \
    && cp "$WD/recal_ab_seed$s.json" tools/parity/results_r3/full_noise_recal_ab_seed$s.json
done
git add tools/parity/results_r3/full_noise_* 2>/dev/null \
  && git commit -q -m "Snapshot full-scale noise seed matrix + per-seed recal A/Bs (auto)" \
  && echo "snapshot committed" || echo "nothing to commit"
echo "=== R4 S5 QUEUE COMPLETE $(date -u) ==="
