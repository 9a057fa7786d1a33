#!/bin/bash
# Round-5 long-job chain: the CPU-bound parity measurement jobs,
# sequentially (ONE physical core — concurrent jobs only inflate each
# other's step times). Each parity stage checkpoints every (seed, fold)
# cell in progress.json, so a timeout mid-stage loses at most one cell
# and the merge still assembles every COMPLETED seed.
#
#   1. SumMe bilstm seeds 2-4  -> decisive bilstm verdict at 5 seeds
#      (VERDICT r4 item 3; bilstm is the shipped default encoder —
#      attention's SumMe row stays at 2 seeds, honestly FAIL-POWER)
#   2. merge into PARITY_F1.{json,md}
#   3. TVSum attention seeds 5-9 -> decide the flagship-encoder verdict
#      (--variants attention skips the bilstm arm: its 5-seed verdict
#      is already decisive PASS)
#   4. merge
#
# Stage timeouts keep the chain inside the round budget so the driver's
# end-of-round bench gets a quiet core.  Progress markers land in
# /tmp/r5_chain.status after each stage.
set -u
cd /root/repo
XHOST_REASON="host recycled between rounds; fresh seeds ran on the new host (torch CPU reduction order is host-dependent; paired deltas are computed within one host per seed)"
echo "chain start $(date +%H:%M:%S)" >> /tmp/r5_chain.status

timeout 14400 nice -n 10 python scripts/parity_reference.py \
  --work-dir .parity_r5 --dataset summe \
  --n-seeds 5 --seed-indices 2,3,4 --variants bilstm \
  > /tmp/parity_summe_r5.log 2>&1
echo "summe done rc=$? $(date +%H:%M:%S)" >> /tmp/r5_chain.status

nice -n 10 python scripts/parity_merge.py \
  --work .parity_r5/summe --prev PARITY_F1.json --also PARITY_F1.json \
  --cross-host "$XHOST_REASON" \
  > /tmp/parity_merge_summe.log 2>&1
echo "summe merge rc=$? $(date +%H:%M:%S)" >> /tmp/r5_chain.status

timeout 19800 nice -n 10 python scripts/parity_reference.py \
  --work-dir .parity_r5 --dataset tvsum \
  --n-seeds 10 --seed-indices 5,6,7,8,9 --variants attention \
  > /tmp/parity_tvsum_ext.log 2>&1
echo "tvsum ext done rc=$? $(date +%H:%M:%S)" >> /tmp/r5_chain.status

nice -n 10 python scripts/parity_merge.py \
  --work .parity_r5/tvsum --prev PARITY_F1.json --also PARITY_F1.json \
  --cross-host "$XHOST_REASON" \
  > /tmp/parity_merge_tvsum.log 2>&1
echo "tvsum merge rc=$? $(date +%H:%M:%S)" >> /tmp/r5_chain.status
echo "chain complete $(date +%H:%M:%S)" >> /tmp/r5_chain.status
