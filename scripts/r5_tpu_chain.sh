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
set -u
cd /root/repo
echo "tpu chain start $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status

AVSUM_PLATFORM=tpu timeout 5400 python scripts/exp_deep_pp.py \
  --config deep_pp --epochs 600 --eval-every 50 \
  --out docs/deep_pp_curve_r05.json \
  > /tmp/exp_deep_pp.log 2>&1
echo "deep_pp curve rc=$? $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status

AVSUM_PLATFORM=tpu timeout 3600 python scripts/exp_deep_pp.py \
  --config flagship_attention --epochs 600 --eval-every 100 \
  --out docs/flagship_curve_r05.json \
  > /tmp/exp_flagship.log 2>&1
echo "flagship curve rc=$? $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status

AVSUM_PLATFORM=tpu timeout 7200 python scripts/bench_pp_ep.py \
  --mesh-one --folds 0,1,2 --n-seeds 2 \
  --configs flagship_attention,moe_ep \
  --work-dir /tmp/ppep_tpu --out /tmp/ppep_r5_tpu.json \
  > /tmp/ppep_r5_tpu.log 2>&1
echo "ppep quality rc=$? $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
echo "tpu chain complete $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
