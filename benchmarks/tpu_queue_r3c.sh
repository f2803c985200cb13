#!/bin/bash
# Round-3 final TPU chain: waits for the resumed quality run (PID $1) to
# exit, then runs a fresh bench.py so BENCH numbers are current and the TPU
# is idle before round end. ONE TPU process at a time; never kill mid-work
# (NOTES.md environment hazards).
# Usage: nohup bash benchmarks/tpu_queue_r3c.sh <qpid> &
set -u
QPID=${1:?pid of the running quality_run}
cd /root/repo
while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
echo "[queue3] quality_run ($QPID) exited at $(date)" >> /tmp/tpu_queue.log
python bench.py > /tmp/bench_r3.json 2> /tmp/bench_r3.log
echo "[queue3] bench done rc=$? at $(date)" >> /tmp/tpu_queue.log
python benchmarks/summarize_quality.py docs/artifacts/quality_run_r3b \
    > docs/artifacts/quality_run_r3b/summary.json 2>/tmp/summary_r3b.log
echo "[queue3] summary done rc=$? at $(date)" >> /tmp/tpu_queue.log
