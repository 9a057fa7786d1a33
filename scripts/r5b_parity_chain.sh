#!/bin/bash
# Round-5 restart (host recycled mid-round; /tmp and .parity_r5 lost):
# the remaining CPU-bound parity job — TVSum attention seeds 5-9 —
# to decide the flagship-encoder verdict (VERDICT r4 item 3; per-seed
# delta sigma 2.29 => ~10 seeds shrink the seed-level CI half-width to
# ~1.6 pts). SumMe bilstm is already decisive (commit 412ae37).
#
# Checkpoints every (seed, fold) cell in .parity_r5/tvsum/progress.json,
# so a timeout loses at most one cell and the merge assembles every
# completed seed. nice -n 10 keeps the single core responsive for the
# concurrent TPU chain's host work.
set -u
cd /root/repo
XHOST_REASON="host recycled between rounds; fresh seeds ran on the new host (torch CPU reduction order is host-dependent; paired deltas are computed within one host per seed)"
echo "parity chain start $(date +%H:%M:%S)" >> /tmp/r5b.status

timeout 23400 nice -n 10 python scripts/parity_reference.py \
  --work-dir .parity_r5 --dataset tvsum \
  --n-seeds 10 --seed-indices 5,6,7,8,9 --variants attention \
  > /tmp/parity_tvsum_ext.log 2>&1
echo "tvsum attention ext rc=$? $(date +%H:%M:%S)" >> /tmp/r5b.status

nice -n 10 python scripts/parity_merge.py \
  --work .parity_r5/tvsum --prev PARITY_F1.json --also PARITY_F1.json \
  --cross-host "$XHOST_REASON" \
  > /tmp/parity_merge_tvsum.log 2>&1
echo "tvsum merge rc=$? $(date +%H:%M:%S)" >> /tmp/r5b.status
echo "parity chain complete $(date +%H:%M:%S)" >> /tmp/r5b.status
