#!/bin/bash
# Round-5 scaling-evidence watcher (r4 verdict #2): wait for a quiet
# host window (mem_stream calibration >= THRESH), then capture real
# executor-JVM 1-vs-4 scaling on the shipped engine with the TTL
# regime OFF and ON (SPARK_GRAFT_TTL=1 probes the liveness view
# Filter(Agg(status log)) in the measured round), plus the sf0.1
# headline — each bracketed by calibrations.
cd "$(dirname "$0")/.." || exit 1
THRESH="${1:-0.7}"
OUT="${2:-/tmp/r5_watch}"
mkdir -p "$OUT"
while true; do
  python tools/calibrate_host.py > "$OUT/cal_before.json" 2>&1
  eff=$(python - "$OUT/cal_before.json" <<'EOF'
import json, sys
lines = [l for l in open(sys.argv[1]).read().splitlines() if l.startswith("{")]
print(json.loads(lines[-1])["efficiency"])
EOF
)
  echo "$(date +%H:%M:%S) mem_stream_eff=$eff" >> "$OUT/log.txt"
  if python -c "exit(0 if float('$eff') >= float('$THRESH') else 1)"; then
    echo "$(date +%H:%M:%S) window open — executor scaling (ttl off)" >> "$OUT/log.txt"
    python tools/executor_scaling.py --reps 3 --no-calibrate \
      > "$OUT/execs.json" 2> "$OUT/execs.err"
    python tools/calibrate_host.py > "$OUT/cal_mid1.json" 2>&1
    echo "$(date +%H:%M:%S) executor scaling (ttl on)" >> "$OUT/log.txt"
    SPARK_GRAFT_TTL=1 python tools/executor_scaling.py --reps 3 --no-calibrate \
      > "$OUT/execs_ttl.json" 2> "$OUT/execs_ttl.err"
    python tools/calibrate_host.py > "$OUT/cal_mid2.json" 2>&1
    echo "$(date +%H:%M:%S) sf0.1 headline" >> "$OUT/log.txt"
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_QUERIES=none \
      python bench.py > "$OUT/headline.json" 2> "$OUT/headline.err"
    python tools/calibrate_host.py > "$OUT/cal_after.json" 2>&1
    echo "$(date +%H:%M:%S) MEASURED" >> "$OUT/log.txt"
    break
  fi
  sleep 420
done
