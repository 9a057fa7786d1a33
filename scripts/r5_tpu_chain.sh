#!/bin/bash
# Round-5 TPU-side measurement chain (serial: ONE chip behind the
# tunnel). Runs while scripts/r5_chain.sh owns the CPU core with the
# parity seed plan. Stages:
#   1. deep_pp training-budget curve (VERDICT r4 item 1: test the
#      committed "undertrained calibration" hypothesis with data)
#   2. flagship control curve on the same world/fold/seed
#   3. multi-fold PP/EP quality cells (VERDICT r4 item 4): folds 0-2 x
#      seeds 0,1 for flagship+moe_ep on a 1x1x1 chip mesh (identical
#      math to the PP/EP meshes; rows stamped backend=tpu)
#
# The axon tunnel dies for minutes-to-hours at a time (00:56 window:
# even jax.devices() in a fresh process hangs). Every stage is gated on
# a liveness probe loop so a dead tunnel costs bounded probe time, not
# a full stage timeout of hang.
set -u
cd /root/repo
echo "tpu chain start $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status

wait_tpu() {  # up to ~50 min of 60s-interval probes
  for i in $(seq 1 20); do
    timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1 \
      && return 0
    echo "tpu probe $i dead $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
    sleep 60
  done
  return 1
}

run_stage() {  # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  if ! wait_tpu; then
    echo "$name SKIPPED (tunnel dead) $(date +%H:%M:%S)" \
      >> /tmp/r5_tpu_chain.status
    return 1
  fi
  timeout "$tmo" "$@"
  echo "$name rc=$? $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
}

run_stage deep_pp_curve 5400 \
  env AVSUM_PLATFORM=tpu python scripts/exp_deep_pp.py \
  --config deep_pp --epochs 600 --eval-every 50 \
  --out docs/deep_pp_curve_r05.json \
  > /tmp/exp_deep_pp.log 2>&1

run_stage flagship_curve 3600 \
  env AVSUM_PLATFORM=tpu python scripts/exp_deep_pp.py \
  --config flagship_attention --epochs 600 --eval-every 100 \
  --out docs/flagship_curve_r05.json \
  > /tmp/exp_flagship.log 2>&1

run_stage ppep_quality 7200 \
  env AVSUM_PLATFORM=tpu python scripts/bench_pp_ep.py \
  --mesh-one --folds 0,1,2 --n-seeds 2 \
  --configs flagship_attention,moe_ep \
  --work-dir /tmp/ppep_tpu --out /tmp/ppep_r5_tpu.json \
  > /tmp/ppep_r5_tpu.log 2>&1

echo "tpu chain complete $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
