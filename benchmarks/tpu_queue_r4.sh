#!/bin/bash
# Round-4 TPU job queue: waits for the quality run (pid $1) to exit, then
# runs the perf/validation sequence on the freed chip, serialized (one TPU
# process at a time; NOTES.md environment hazards).
set -u
QPID=${1:?pid of the running quality_run}
cd /root/repo
while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
echo "[queue4] quality_run ($QPID) exited at $(date)" >> /tmp/tpu_queue.log

# 1. summarize the finished quality run (CPU-side, cheap)
python benchmarks/summarize_quality.py docs/artifacts/quality_run_r4 \
    > docs/artifacts/quality_run_r4/summary_full.json 2>/tmp/summary_r4.log \
    || echo "[queue4] summarize failed" >> /tmp/tpu_queue.log

# 2. fresh device trace of the bench step (VERDICT r3 next #4)
python benchmarks/profile_trace.py > /tmp/trace_r4.log 2>&1 \
    || echo "[queue4] profile_trace failed" >> /tmp/tpu_queue.log

# 3. bench A/B: full-K (default at K=1024) vs forced-blocked backward
python bench.py > /tmp/bench_full.json 2>/tmp/bench_full.log \
    || echo "[queue4] bench full failed" >> /tmp/tpu_queue.log
SGS_BWD_BLOCKED=1 python bench.py > /tmp/bench_blocked.json 2>/tmp/bench_blocked.log \
    || echo "[queue4] bench blocked failed" >> /tmp/tpu_queue.log

# 4. ladder rungs 4-5 on the real chip (VERDICT r3 next #6)
python benchmarks/ladder.py --rung 4 > docs/artifacts/ladder/rung4_tpu.json 2>/tmp/rung4.log \
    || echo "[queue4] rung4 failed" >> /tmp/tpu_queue.log
python benchmarks/ladder.py --rung 5 > docs/artifacts/ladder/rung5_tpu.json 2>/tmp/rung5.log \
    || echo "[queue4] rung5 failed" >> /tmp/tpu_queue.log
echo "[queue4] done at $(date)" >> /tmp/tpu_queue.log
