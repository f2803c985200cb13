"""Parse a jax.profiler trace dir directly into per-op device self-times.

The tensorboard_plugin_profile converters break on the installed protobuf
(NOTES.md round-2 lesson) — jax.profiler also writes a Chrome-format
``*.trace.json.gz`` natively, which this reads directly: sum `dur` of
complete events on the TensorCore op track by event name, divide by the
number of profiled steps, and print the top ops + a stage-bucketed summary
aligned with benchmarks/sol_model.py's stage names.

  python benchmarks/profile_trace.py          # captures /tmp/jaxtrace
  python benchmarks/parse_trace.py /tmp/jaxtrace --steps 3 --json out.json
"""

import argparse
import glob
import gzip
import json
import re
import sys
from collections import defaultdict


# stage buckets: pattern -> stage (first match wins; patterns target XLA
# fusion/custom-call names observed in the r2/r4 traces)
STAGE_PATTERNS = [
    (r"sort", "sorts"),
    (r"composite.*bwd|bwd.*composite|_backward_kernel", "composite_bwd"),
    (r"composite|_forward_kernel", "composite_fwd"),
    (r"expand_spans|expand_rows|one_hot|onehot", "expand"),
    (r"segsum|segment_sum", "segsum"),
    (r"pair_table|window_table", "pair_table"),
    (r"while", "searchsorted_while"),
    (r"copy|pad|transpose|bitcast|concatenate|slice", "copies_pads"),
    (r"dot|conv", "matmuls_misc"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/jaxtrace")
    ap.add_argument("--steps", type=int, default=3,
                    help="profiled steps (times are reported per step)")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    paths = glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        sys.exit(f"no *.trace.json.gz under {args.trace_dir}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # device op tracks: process names containing TPU/TensorCore; XLA op
    # events are 'X' (complete) with dur. Keep per-(pid,tid) sums and pick
    # the track family that looks like device ops (largest total on a
    # TensorCore pid).
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        pid for pid, name in pid_name.items()
        if re.search(r"TPU|TensorCore|/device:", name, re.I)
    }
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        # tensorboard emits nested tracks; keep leaf op names only (skip
        # step/module envelopes)
        if re.match(r"jit_|pjit|XLA Modules|Steps", name):
            continue
        by_name[name] += e["dur"]  # us
        total += e["dur"]

    per_step = {k: v / args.steps / 1000.0 for k, v in by_name.items()}  # ms
    ranked = sorted(per_step.items(), key=lambda kv: -kv[1])
    print(f"track pids: {sorted(dev_pids) or 'ALL'}; "
          f"total {total / args.steps / 1000.0:.1f} ms/step over "
          f"{len(by_name)} op names")
    stages = defaultdict(float)
    for name, ms in ranked:
        stage = "other"
        for pat, st in STAGE_PATTERNS:
            if re.search(pat, name, re.I):
                stage = st
                break
        stages[stage] += ms
    print("\n-- stage buckets (ms/step) --")
    for st, ms in sorted(stages.items(), key=lambda kv: -kv[1]):
        print(f"  {st:20s} {ms:8.2f}")
    print(f"\n-- top {args.top} ops (ms/step) --")
    for name, ms in ranked[: args.top]:
        print(f"  {ms:8.3f}  {name[:110]}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {"per_step_ms": dict(ranked), "stages": dict(stages)},
                f, indent=1,
            )
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
