#!/bin/bash
# Round-4 TPU chain #2 (after r7's full-color seed matrix frees the chip):
#   I.  int8 re-probe on the current toolchain (VERDICT r3 item 2) — now
#       covers the XLA dot_general route alongside the Mosaic one
#   C.  cosine-lr-schedule color_distortion variant at full scale (the
#       sanctioned schedule A/B for the one residual quality loss)
#   Q.  sequential-vs-top1 routing quality A/B (VERDICT r3 item 7)
#   B.  bench.py rehearsal (deadline-proof ladder, warm cache for the
#       driver's end-of-round run)
# Everything idempotent; artifacts committed as they land.
#
# Usage: setsid nohup bash tools/queues/r8_tpu_queue.sh > /root/scratch/r8_tpu_queue.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/scratch/jaxcache
mkdir -p /root/scratch/jaxcache /root/scratch/markers
WD=/root/scratch/parity_r3/full_color
RES=tools/parity/results_r3
echo "=== R8 TPU QUEUE START $(date -u) ==="

# wait for the r7 queue to release the chip (C2 marker), max 4 h
for i in $(seq 1 120); do
  [ -f /root/scratch/markers/r7_C2.done ] && break
  sleep 120
done
echo "=== chip window open $(date -u) ==="

# ---- I: int8 re-probe (three routes; receipt for PERF.md)
echo "=== stage I: int8 reprobe $(date -u) ==="
timeout 1800 python benchmarks/exp_int8_reprobe.py --iters 20 \
  2>&1 | grep -v WARNING | tee /root/scratch/int8_reprobe_r4.txt \
  || echo "stage I FAILED"

# ---- C: cosine-schedule color variant at full scale
echo "=== stage C: cosine color variant $(date -u) ==="
timeout 10800 python tools/parity/variant_run.py --workdir "$WD" \
  --task color_distortion --tag cosine --set 'train.lr_schedule="cosine"' \
  2>&1 | grep -v WARNING || echo "stage C FAILED"
cp "$WD/variant_cosine.json" "$RES/full_color_variant_cosine.json" 2>/dev/null
git add "$RES/full_color_variant_cosine.json" 2>/dev/null \
  && git commit -q -m "Full-scale color_distortion cosine-lr variant (auto)" \
  && echo "stage C committed" || echo "stage C nothing to commit"
touch /root/scratch/markers/r8_C.done

# ---- Q: sequential vs top1 routing quality A/B
echo "=== stage Q: seq routing A/B $(date -u) ==="
timeout 14400 python benchmarks/ab_seq_routing.py \
  --workdir /root/scratch/ab_seq 2>&1 | grep -v WARNING \
  || echo "stage Q FAILED"
git add "$RES/seq_routing_ab.json" 2>/dev/null \
  && git commit -q -m "Sequential-vs-top1 routing quality A/B on composed degradations (auto)" \
  && echo "stage Q committed" || echo "stage Q nothing to commit"
touch /root/scratch/markers/r8_Q.done

# ---- B: bench rehearsal (annotated even under contention)
echo "=== stage B: bench rehearsal $(date -u) ==="
BENCH_BUDGET_S=900 timeout 960 python bench.py \
  2> /root/scratch/bench_rehearsal_r4.err | tee /root/scratch/bench_rehearsal_r4.json
tail -5 /root/scratch/bench_rehearsal_r4.err
touch /root/scratch/markers/r8_B.done
echo "=== R8 TPU QUEUE COMPLETE $(date -u) ==="
