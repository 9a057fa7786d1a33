#!/bin/bash
# Round-5 second restart (host recycled again; /tmp + bench_data lost
# before r5b chains ever started). Re-budgeted for a short session:
#   1. deep_pp budget curve, 250 epochs eval-every-10 (VERDICT r4 item
#      1): the lost first partial saw canonical F1 0.623@50 vs
#      0.32@100, so the informative region is early — a dense early
#      curve decides "undertrained" vs "calibration dip" and picks the
#      shipped recipe.
#   2. PP/EP discriminative-power rows (item 4): flagship + moe_ep,
#      folds 0,1,2 x seeds 0,1, per-video paired deltas.
#   3. Embed-batch 256-vs-512 interleaved A/B with tail buckets (item 7).
# Hour-scale recapture (item 6) needs a ~20 min single-core media
# regeneration; it runs LAST and only if the core is free.
set -u
cd /root/repo
echo "tpu chain start $(date +%H:%M:%S)" >> /tmp/r5c.status

wait_tpu() {
  for i in $(seq 1 10); do
    timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1 \
      && return 0
    echo "tpu probe $i dead $(date +%H:%M:%S)" >> /tmp/r5c.status
    sleep 30
  done
  return 1
}

run_stage() {
  local name=$1 tmo=$2; shift 2
  if ! wait_tpu; then
    echo "$name SKIPPED (tunnel dead) $(date +%H:%M:%S)" >> /tmp/r5c.status
    return 1
  fi
  timeout "$tmo" "$@"
  echo "$name rc=$? $(date +%H:%M:%S)" >> /tmp/r5c.status
}

run_stage deep_pp_curve 3300 \
  env AVSUM_PLATFORM=tpu python scripts/exp_deep_pp.py \
  --config deep_pp --epochs 250 --eval-every 10 \
  --out docs/deep_pp_curve_r05.json \
  > /tmp/exp_deep_pp.log 2>&1

run_stage ppep_power 7200 \
  env AVSUM_PLATFORM=tpu python scripts/bench_pp_ep.py \
  --mesh-one --folds 0,1,2 --n-seeds 2 \
  --configs flagship_attention,moe_ep \
  --work-dir /tmp/ppep_tpu --out /tmp/ppep_r5_tpu.json \
  > /tmp/ppep_power.log 2>&1

run_stage embed_ab 2700 \
  env AVSUM_PLATFORM=tpu python scripts/ab_embed_batch.py \
  --batches 256,512 --rounds 4 \
  --out docs/ab_embed_batch_r05.json \
  > /tmp/ab_embed.log 2>&1

run_stage hour_bench 5400 \
  python scripts/bench_hour.py --runs 2 \
  > /tmp/bench_hour_r5.log 2>&1

echo "tpu chain complete $(date +%H:%M:%S)" >> /tmp/r5c.status
