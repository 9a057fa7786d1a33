#!/bin/bash
# Round-5 restart TPU chain (host recycled; the first session's /tmp
# results were lost). Order = judge priority:
#   1. deep_pp budget curve, 600 epochs eval-every-25 (VERDICT item 1:
#      the first partial run saw 0.623 at epoch 50 vs 0.32 at 100 —
#      the curve decides between "undertrained" and "quality dip").
#   2. PP/EP discriminative-power rows: flagship + moe_ep on folds
#      0,1,2 x seeds 0,1 with per-video paired deltas (item 4).
#      deep_pp quality cells run separately once the curve picks the
#      recipe.
#   3. Hour-scale north-star recapture with every round-4/5
#      optimization enabled (item 6; media regenerated one-time).
#   4. Embed-batch 256-vs-512 interleaved A/B with tail buckets (item 7).
# Every stage is gated on a tunnel-liveness probe and bounded by
# timeout so the driver's end-of-round bench gets a quiet core.
set -u
cd /root/repo
echo "tpu chain start $(date +%H:%M:%S)" >> /tmp/r5b.status

wait_tpu() {
  for i in $(seq 1 20); do
    timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1 \
      && return 0
    echo "tpu probe $i dead $(date +%H:%M:%S)" >> /tmp/r5b.status
    sleep 60
  done
  return 1
}

run_stage() {
  local name=$1 tmo=$2; shift 2
  if ! wait_tpu; then
    echo "$name SKIPPED (tunnel dead) $(date +%H:%M:%S)" >> /tmp/r5b.status
    return 1
  fi
  timeout "$tmo" "$@"
  echo "$name rc=$? $(date +%H:%M:%S)" >> /tmp/r5b.status
}

run_stage deep_pp_curve 9000 \
  env AVSUM_PLATFORM=tpu python scripts/exp_deep_pp.py \
  --config deep_pp --epochs 600 --eval-every 25 \
  --out docs/deep_pp_curve_r05.json \
  > /tmp/exp_deep_pp.log 2>&1

run_stage ppep_power 16200 \
  env AVSUM_PLATFORM=tpu python scripts/bench_pp_ep.py \
  --mesh-one --folds 0,1,2 --n-seeds 2 \
  --configs flagship_attention,moe_ep \
  --work-dir /tmp/ppep_tpu --out /tmp/ppep_r5_tpu.json \
  > /tmp/ppep_power.log 2>&1

run_stage hour_bench 7200 \
  python scripts/bench_hour.py --runs 3 \
  > /tmp/bench_hour_r5.log 2>&1

run_stage embed_ab 5400 \
  python scripts/ab_embed_batch.py --batches 256,512 --rounds 4 \
  --out docs/ab_embed_batch_r05.json \
  > /tmp/ab_embed.log 2>&1

echo "tpu chain complete $(date +%H:%M:%S)" >> /tmp/r5b.status
