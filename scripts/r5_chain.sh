#!/bin/bash
# Round-5 long-job chain: the CPU-bound measurement jobs, sequentially
# (ONE physical core — concurrent jobs only inflate each other's step
# times). Each job checkpoints (parity: progress.json; bench_pp_ep:
# JSONL rows in its log), so a killed chain resumes where it stopped.
#
#   1. SumMe parity seeds 2-4 (launched separately; we wait on its pid)
#   2. TVSum attention-variant extension seeds 5-9 (--variants attention
#      skips the bilstm arm: its 5-seed verdict is already decisive)
#   3. PP/EP quality bench folds 1,2 x seeds 0,1 with per-video paired
#      deltas vs flagship (VERDICT r4 item 4)
#
# Progress markers land in /tmp/r5_chain.status after each stage.
set -u
cd /root/repo
echo "chain start $(date +%H:%M:%S)" >> /tmp/r5_chain.status

if [ -f /tmp/parity_summe_r5.pid ]; then
  while kill -0 "$(cat /tmp/parity_summe_r5.pid)" 2>/dev/null; do sleep 60; done
fi
echo "summe done $(date +%H:%M:%S)" >> /tmp/r5_chain.status

nice -n 10 python scripts/parity_reference.py \
  --work-dir .parity_r4 --dataset tvsum \
  --n-seeds 10 --seed-indices 5,6,7,8,9 --variants attention \
  > /tmp/parity_tvsum_ext.log 2>&1
echo "tvsum ext done rc=$? $(date +%H:%M:%S)" >> /tmp/r5_chain.status

nice -n 10 python scripts/bench_pp_ep.py \
  --folds 1,2 --n-seeds 2 --configs flagship_attention,moe_ep \
  --out /tmp/ppep_r5.json --work-dir /tmp/ppep_r5 \
  > /tmp/ppep_r5.log 2>&1
echo "ppep done rc=$? $(date +%H:%M:%S)" >> /tmp/r5_chain.status
