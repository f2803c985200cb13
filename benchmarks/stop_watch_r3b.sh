#!/bin/bash
# Clean-stop the r3b quality run just before step 30000: step 30000 is a
# multiple of the 3000-step opacity-reset interval (reference schedule,
# gs_control.py:38,206), so a run that reaches exactly 30000 applies the
# reset and the FINAL eval measures the intentional near-transparent
# transient (~9 dB) instead of the converged model. Touching <out>/STOP at
# step >= 29800 exits within 20 steps — before the reset — losing < 0.7% of
# the schedule. Usage: nohup bash benchmarks/stop_watch_r3b.sh &
set -u
OUT=/root/repo/docs/artifacts/quality_run_r3b
while true; do
  last=$(tail -1 "$OUT/metrics.jsonl" 2>/dev/null |
         python3 -c 'import sys,json;print(json.load(sys.stdin)["step"])' \
         2>/dev/null || echo 0)
  if [ "$last" -ge 29800 ]; then
    touch "$OUT/STOP"
    echo "[stopwatch] STOP touched at logged step $last ($(date))" \
      >> /tmp/tpu_queue.log
    exit 0
  fi
  # also exit if the run itself is gone
  pgrep -f quality_run.py > /dev/null 2>&1 || exit 0
  sleep 2
done
