#!/bin/bash
# Window-catcher: this guest's memory bandwidth comes and goes with
# external load (mem-stream 2->8 efficiency observed anywhere from
# 0.06 to 0.78 across one day). Poll the same-hour calibration and
# run the 24M-URL frontier N-vs-4N scaling bench only inside a
# quiet window, bracketing it with before/after calibrations so the
# measurement is gated evidence, not a noise draw. A MID-calibration
# between the two legs localizes any decay to one leg, and the
# sf0.1 driver-config headline rides the same window so the headline
# and the scaling ratio are comparable host states.
cd "$(dirname "$0")/.." || exit 1
THRESH="${1:-0.55}"
while true; do
  python tools/calibrate_host.py > /tmp/win_cal.json 2>&1
  eff=$(python - <<'EOF'
import json
lines = [l for l in open("/tmp/win_cal.json").read().splitlines() if l.startswith("{")]
print(json.loads(lines[-1])["efficiency"])
EOF
)
  echo "$(date +%H:%M:%S) mem_stream_eff=$eff" >> /tmp/window_log.txt
  if python -c "exit(0 if float('$eff') >= float('$THRESH') else 1)"; then
    echo "$(date +%H:%M:%S) window open — measuring" >> /tmp/window_log.txt
    SPARK_GRAFT_FRONTIER=24000000 SPARK_GRAFT_CPUS=8 \
      SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_QUERIES=none \
      python bench.py > /tmp/win_c8.json 2>/tmp/win_c8.err
    python tools/calibrate_host.py > /tmp/win_cal_mid.json 2>&1
    SPARK_GRAFT_FRONTIER=24000000 SPARK_GRAFT_CPUS=2 \
      SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_QUERIES=none \
      python bench.py > /tmp/win_c2.json 2>/tmp/win_c2.err
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
      SPARK_GRAFT_BENCH_QUERIES=none \
      python bench.py > /tmp/win_headline.json 2>/tmp/win_headline.err
    python tools/calibrate_host.py > /tmp/win_cal_after.json 2>&1
    echo "$(date +%H:%M:%S) MEASURED" >> /tmp/window_log.txt
    break
  fi
  sleep 600
done
