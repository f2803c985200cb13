"""Parse a jax.profiler trace dir directly into per-op device self-times.

The tensorboard_plugin_profile converters break on the installed protobuf
(NOTES.md round-2 lesson) — jax.profiler also writes a Chrome-format
``*.trace.json.gz`` natively, which this reads directly: sum `dur` of
complete events on the TensorCore op track by event name, divide by the
number of profiled steps, and print the top ops + a stage-bucketed summary
aligned with benchmarks/sol_model.py's stage names.

Classification (r4): XLA names its pallas calls ``closed_call.N`` with no
kernel hint, so events are classified by their trace args — the ``source``
(file:line of the python call site) and the ``long_name`` output shape.
Step-region events (named "0", "1", ...) and conditional ENVELOPES (the
grad-routing cond contains its sort + segsum as separate leaf events) are
excluded from bucket sums and reported separately.

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


def classify(name, args_d):
    src = args_d.get("source", "")
    long = args_d.get("long_name", "")
    cat = args_d.get("hlo_category", "")
    if re.fullmatch(r"\d+", name):
        return "STEP_REGION"
    if cat == "conditional" or name.startswith(("cond", "branch")):
        return "ENVELOPE"  # contains leaf events already counted
    if "binning.py" in src and cat == "sort":
        return "binning sort"
    if cat == "sort":
        return "grad-routing sort"
    if "expand.py" in src:
        return "binning expand"
    if "rasterize_pallas" in src and cat == "custom-call":
        if re.search(r"= f32\[16,\d{6,}\]", long):
            return "composite bwd"  # compact pair-space grads (16, Pc)
        if re.search(r"= f32\[\d+,8,\d+\]", long):
            return "composite fwd"  # (T, 8, P) tile images
        if re.search(r"= f32\[\d+,16,\d+\]", long):
            return "pair table"  # (T, 16, K) gathered attrs
        if re.search(r"= f32\[9,\d+\]", long):
            return "grad segment sum"  # (9, N) per-gaussian grads
        return "pallas other"
    if "segsum" in src:
        return "grad segment sum"
    if re.search(r"^(copy|pad|transpose|bitcast|concatenate|slice)", name):
        return "copies/pads"
    if name.startswith("while"):
        return "searchsorted/while"
    if re.search(r"sort", name):
        return "sorts other"
    return "other"


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

    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        pid for pid, name in pid_name.items()
        if re.search(r"TPU|TensorCore|/device:", name, re.I)
    }
    by_name = defaultdict(float)
    name_args = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if re.match(r"jit_|pjit|XLA Modules|Steps", name):
            continue
        by_name[name] += e["dur"]  # us
        if "args" in e and name not in name_args:
            name_args[name] = e["args"]

    per_step = {k: v / args.steps / 1000.0 for k, v in by_name.items()}  # ms
    ranked = sorted(per_step.items(), key=lambda kv: -kv[1])
    stages = defaultdict(float)
    extras = defaultdict(float)
    for name, ms in ranked:
        st = classify(name, name_args.get(name, {}))
        (extras if st in ("STEP_REGION", "ENVELOPE") else stages)[st] += ms
    step_ms = extras.get("STEP_REGION", 0.0) * args.steps / max(
        len([n for n in by_name if re.fullmatch(r"\d+", n)]), 1
    )
    counted = sum(stages.values())
    print(f"track pids: {sorted(dev_pids) or 'ALL'}; step span "
          f"{step_ms:.1f} ms; leaf ops sum {counted:.1f} ms/step "
          f"({len(by_name)} op names)")
    print("\n-- stage buckets (ms/step; envelopes excluded) --")
    for st, ms in sorted(stages.items(), key=lambda kv: -kv[1]):
        print(f"  {st:22s} {ms:8.2f}")
    for st, ms in sorted(extras.items()):
        print(f"  [{st}] {ms:8.2f} (not in sum)")
    print(f"\n-- top {args.top} ops (ms/step) --")
    for name, ms in ranked[: args.top]:
        st = classify(name, name_args.get(name, {}))
        print(f"  {ms:8.3f}  {st:20s} {name[:80]}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {"per_step_ms": dict(ranked), "stages": dict(stages),
                 "step_span_ms": step_ms},
                f, indent=1,
            )
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
