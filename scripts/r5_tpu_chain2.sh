#!/bin/bash
# Round-5 TPU chain, part 2 (after r5_tpu_chain.sh's ppep stage):
#   1. deep_pp budget curve with the FIXED chunked-eval loop (the first
#      run trained only 50 epochs — informative but not the full curve):
#      600 epochs, eval every 25 — shows whether quality dips between
#      epoch 50 (0.623) and 100 (PPEP r4: 0.32) or holds
#   2. flagship control curve, fixed loop
#   3. deep_pp multi-fold quality cells appended to the r5 TPU ppep rows
#   4. embed-batch A/B (256 vs 512, interleaved same-window)
set -u
cd /root/repo
echo "tpu chain2 start $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status

wait_tpu() {
  for i in $(seq 1 20); do
    timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1 \
      && return 0
    echo "tpu2 probe $i dead $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
    sleep 60
  done
  return 1
}

run_stage() {
  local name=$1 tmo=$2; shift 2
  if ! wait_tpu; then
    echo "$name SKIPPED (tunnel dead) $(date +%H:%M:%S)" \
      >> /tmp/r5_tpu_chain.status
    return 1
  fi
  timeout "$tmo" "$@"
  echo "$name rc=$? $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
}

run_stage deep_pp_curve_fixed 5400 \
  env AVSUM_PLATFORM=tpu python scripts/exp_deep_pp.py \
  --config deep_pp --epochs 600 --eval-every 25 \
  --out docs/deep_pp_curve_r05.json \
  > /tmp/exp_deep_pp2.log 2>&1

run_stage flagship_curve_fixed 3600 \
  env AVSUM_PLATFORM=tpu python scripts/exp_deep_pp.py \
  --config flagship_attention --epochs 600 --eval-every 50 \
  --out docs/flagship_curve_r05.json \
  > /tmp/exp_flagship2.log 2>&1

python - <<'PYEOF'
import json
rows = json.load(open("/tmp/ppep_r5_tpu.json"))["rows"]
with open("/tmp/ppep_r5_rows.jsonl", "w") as fh:
    for r in rows:
        fh.write(json.dumps(r) + "\n")
print(f"extracted {len(rows)} rows")
PYEOF

run_stage ppep_deep_pp 7200 \
  env AVSUM_PLATFORM=tpu python scripts/bench_pp_ep.py \
  --mesh-one --folds 0,1,2 --n-seeds 2 --configs deep_pp \
  --append-rows /tmp/ppep_r5_rows.jsonl \
  --work-dir /tmp/ppep_tpu --out /tmp/ppep_r5_tpu_full.json \
  > /tmp/ppep_deep_pp.log 2>&1

run_stage embed_ab 3600 \
  python scripts/ab_embed_batch.py --batches 256,512 --rounds 4 \
  --out docs/ab_embed_batch_r05.json \
  > /tmp/ab_embed.log 2>&1

echo "tpu chain2 complete $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
