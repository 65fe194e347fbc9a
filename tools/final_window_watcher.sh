#!/bin/bash
# Round-3 final-evidence watcher: wait for a quiet host window, then
# capture (a) interleaved paired N-vs-4N thread scaling, (b) real
# executor-JVM 1-vs-4 scaling, (c) the sf0.1 headline — each bracketed
# by calibrations so the record is gated evidence, not a noise draw.
cd "$(dirname "$0")/.." || exit 1
THRESH="${1:-0.55}"
OUT=/tmp/final_watch
mkdir -p "$OUT"
while true; do
  python tools/calibrate_host.py > "$OUT/cal_before.json" 2>&1
  eff=$(python - <<'EOF'
import json
lines = [l for l in open("/tmp/final_watch/cal_before.json").read().splitlines() if l.startswith("{")]
print(json.loads(lines[-1])["efficiency"])
EOF
)
  echo "$(date +%H:%M:%S) mem_stream_eff=$eff" >> "$OUT/log.txt"
  if python -c "exit(0 if float('$eff') >= float('$THRESH') else 1)"; then
    echo "$(date +%H:%M:%S) window open — paired scaling" >> "$OUT/log.txt"
    python tools/paired_scaling.py --n 24000000 --hi 8 --lo 2 --pairs 3 \
      > "$OUT/paired.json" 2> "$OUT/paired.err"
    python tools/calibrate_host.py > "$OUT/cal_mid.json" 2>&1
    echo "$(date +%H:%M:%S) executor scaling" >> "$OUT/log.txt"
    python tools/executor_scaling.py --reps 3 \
      > "$OUT/execs.json" 2> "$OUT/execs.err"
    echo "$(date +%H:%M:%S) sf0.1 headline" >> "$OUT/log.txt"
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_QUERIES=none \
      python bench.py > "$OUT/headline.json" 2> "$OUT/headline.err"
    python tools/calibrate_host.py > "$OUT/cal_after.json" 2>&1
    echo "$(date +%H:%M:%S) MEASURED" >> "$OUT/log.txt"
    break
  fi
  sleep 420
done
