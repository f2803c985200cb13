#!/bin/bash
# Round-3 TPU job chain: waits for the quality run to exit, then runs the
# short TPU validation set (bench.py with the round-3 probe graph, ladder
# rung 3). ONE TPU process at a time; never killed mid-work (NOTES.md
# environment hazards). Usage: nohup bash benchmarks/tpu_queue_r3.sh <qpid> &
set -u
QPID=${1:?pid of the running quality_run}
cd /root/repo
while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
echo "[queue] quality_run ($QPID) exited at $(date)" >> /tmp/tpu_queue.log
python bench.py > /tmp/bench_r3.json 2> /tmp/bench_r3.log
echo "[queue] bench done rc=$? at $(date)" >> /tmp/tpu_queue.log
python benchmarks/ladder.py --rung 3 --out docs/artifacts/ladder/rung3_tpu.json \
    > /tmp/rung3.log 2>&1
echo "[queue] rung3 done rc=$? at $(date)" >> /tmp/tpu_queue.log
