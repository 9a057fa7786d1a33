#!/bin/bash
# Round-5 second restart: CPU-bound TVSum attention seed extension
# (seeds 5-9; VERDICT r4 item 3), niced hard so the concurrent TPU
# chain owns the single core whenever it needs host work. Bounded to
# this session; the per-cell progress.json checkpointing means the
# merge step assembles every COMPLETED seed even on timeout.
set -u
cd /root/repo
XHOST_REASON="host recycled between rounds; fresh seeds ran on the new host (torch CPU reduction order is host-dependent; paired deltas are computed within one host per seed)"
echo "parity chain start $(date +%H:%M:%S)" >> /tmp/r5c.status

timeout 10800 nice -n 19 python scripts/parity_reference.py \
  --work-dir .parity_r5 --dataset tvsum \
  --n-seeds 10 --seed-indices 5,6,7,8,9 --variants attention \
  > /tmp/parity_tvsum_ext.log 2>&1
echo "tvsum attention ext rc=$? $(date +%H:%M:%S)" >> /tmp/r5c.status

nice -n 19 python scripts/parity_merge.py \
  --work .parity_r5/tvsum --prev PARITY_F1.json --also PARITY_F1.json \
  --cross-host "$XHOST_REASON" \
  > /tmp/parity_merge_tvsum.log 2>&1
echo "tvsum merge rc=$? $(date +%H:%M:%S)" >> /tmp/r5c.status
echo "parity chain complete $(date +%H:%M:%S)" >> /tmp/r5c.status
