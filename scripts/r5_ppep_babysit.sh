#!/bin/bash
# Babysit the r5 ppep TPU quality run: the axon tunnel wedges running
# processes indefinitely (healthy cells log every ~0.3s; a wedged one
# goes silent forever while the tunnel itself recovers). Watch the log's
# mtime; on a >12-min stall, kill the run and salvage-restart (completed
# rows re-fed via --append-rows). Stops when the output JSON lands or
# after 10 attempts. Usage: bash scripts/r5_ppep_babysit.sh [configs]
set -u
cd /root/repo
CONFIGS="${1:-flagship_attention,moe_ep}"
OUT=/tmp/ppep_r5_tpu.json
LOG=/tmp/ppep_r5_tpu.log
rm -f "$OUT"

salvage() {
  python - <<'PYEOF'
import json, os
rows, seen = [], set()
if os.path.exists("/tmp/ppep_r5_tpu.log"):
    for line in open("/tmp/ppep_r5_tpu.log"):
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = (d.get("config"), d.get("fold", 0), d.get("seed"))
            if "config" in d and "canonical_f1" in d and k not in seen:
                seen.add(k)
                rows.append(d)
with open("/tmp/ppep_r5_rows.jsonl", "w") as fh:
    for r in rows:
        fh.write(json.dumps(r) + "\n")
print(f"salvaged {len(rows)} rows", flush=True)
PYEOF
}

for attempt in $(seq 1 10); do
  salvage
  echo "ppep babysit attempt $attempt $(date +%H:%M:%S)" \
    >> /tmp/r5_tpu_chain.status
  AVSUM_PLATFORM=tpu python scripts/bench_pp_ep.py \
    --mesh-one --folds 0,1,2 --n-seeds 2 \
    --configs "$CONFIGS" \
    --append-rows /tmp/ppep_r5_rows.jsonl \
    --work-dir /tmp/ppep_tpu --out "$OUT" \
    >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt 720 ]; then
      echo "ppep babysit: stall ${age}s, killing $(date +%H:%M:%S)" \
        >> /tmp/r5_tpu_chain.status
      kill -9 "$PID" 2>/dev/null
      sleep 3
      break
    fi
  done
  wait "$PID" 2>/dev/null
  if [ -s "$OUT" ]; then
    echo "ppep babysit done rc=0 $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
    exit 0
  fi
done
echo "ppep babysit EXHAUSTED $(date +%H:%M:%S)" >> /tmp/r5_tpu_chain.status
exit 1
