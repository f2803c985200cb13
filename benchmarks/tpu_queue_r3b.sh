#!/bin/bash
# Second round-3 TPU chain: waits for the first queue (bench + rung3,
# tpu_queue_r3.sh) to exit, then completes the oracle-GT quality evidence
# (the committed artifact was interrupted at step 500) and captures a fresh
# device trace of the bench step. ONE TPU process at a time (NOTES.md
# environment hazards). Usage: nohup bash benchmarks/tpu_queue_r3b.sh <qpid> &
set -u
QPID=${1:?pid of the running first queue}
cd /root/repo
while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
echo "[queue2] first queue ($QPID) exited at $(date)" >> /tmp/tpu_queue.log
rm -f docs/artifacts/oracle_gt/eval.jsonl
python benchmarks/oracle_gt_eval.py --out docs/artifacts/oracle_gt \
    > /tmp/oracle_gt.log 2>&1
echo "[queue2] oracle_gt done rc=$? at $(date)" >> /tmp/tpu_queue.log
python benchmarks/profile_trace.py > /tmp/trace_r3.log 2>&1
echo "[queue2] trace done rc=$? at $(date)" >> /tmp/tpu_queue.log
