#!/bin/bash
# Salvage-restart the r5 TPU ppep quality stage after a tunnel death:
# completed rows were printed to the log as JSON lines; feed them back
# via --append-rows so only the missing (config, fold, seed) cells
# re-train. Usage: bash scripts/r5_ppep_salvage.sh [extra configs]
set -u
cd /root/repo
CONFIGS="${1:-flagship_attention,moe_ep}"
python - <<'PYEOF'
import json
rows = []
for line in open("/tmp/ppep_r5_tpu.log"):
    line = line.strip()
    if line.startswith("{"):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "config" in d and "canonical_f1" in d:
            rows.append(d)
with open("/tmp/ppep_r5_rows.jsonl", "w") as fh:
    for r in rows:
        fh.write(json.dumps(r) + "\n")
print(f"salvaged {len(rows)} rows")
PYEOF
echo "ppep salvage restart $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
AVSUM_PLATFORM=tpu timeout 7200 python scripts/bench_pp_ep.py \
  --mesh-one --folds 0,1,2 --n-seeds 2 \
  --configs "$CONFIGS" \
  --append-rows /tmp/ppep_r5_rows.jsonl \
  --work-dir /tmp/ppep_tpu --out /tmp/ppep_r5_tpu.json \
  >> /tmp/ppep_r5_tpu.log 2>&1
echo "ppep salvage rc=$? $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
