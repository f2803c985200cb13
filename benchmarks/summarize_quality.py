"""Summarize a quality_run artifact directory into one readable JSON.

Reads metrics.jsonl / eval.jsonl / densify.jsonl and reports the curves plus
densify-control health (churn rates, screen-prune share, truncation budget).

  python benchmarks/summarize_quality.py docs/artifacts/quality_run_r3
"""

import json
import sys


def load_jsonl(path):
    try:
        with open(path) as f:
            return [json.loads(l) for l in f if l.strip()]
    except FileNotFoundError:
        return []


def main():
    out = sys.argv[1]
    metrics = load_jsonl(f"{out}/metrics.jsonl")
    evals = load_jsonl(f"{out}/eval.jsonl")
    events = load_jsonl(f"{out}/densify.jsonl")

    s = {"dir": out}
    if metrics:
        last = metrics[-1]
        s["steps"] = last["step"]
        s["final_train_psnr"] = last["psnr"]
        s["final_alive"] = last["alive"]
        sec = [m["sec_per_it"] for m in metrics if m["sec_per_it"] < 1.0]
        if sec:
            s["steady_sec_per_it"] = round(sum(sec) / len(sec), 4)
        s["total_truncated"] = sum(m.get("truncated", 0) for m in metrics)
        tail = [m for m in metrics if m["step"] > s["steps"] - 1000]
        s["truncated_last_1k_steps"] = sum(m.get("truncated", 0) for m in tail)
    if evals:
        s["eval_curve"] = [
            {"step": e["step"], "psnr": e["psnr"], "ssim": e["ssim"],
             "alive": e["alive"]}
            for e in evals
        ]
        s["best_eval_psnr"] = max(e["psnr"] for e in evals)
        s["final_eval_psnr"] = evals[-1]["psnr"]
        s["final_eval_ssim"] = evals[-1]["ssim"]
    if events:
        n = len(events)
        alive0 = events[0]["alive"]
        s["densify_events"] = n
        s["alive_first_event"] = alive0
        s["alive_last_event"] = events[-1]["alive"]
        s["mean_split_per_event"] = round(
            sum(e["split"] for e in events) / n, 1
        )
        s["mean_clone_per_event"] = round(
            sum(e["clone"] for e in events) / n, 1
        )
        s["mean_prune_per_event"] = round(
            sum(e["prune"] for e in events) / n, 1
        )
        s["mean_screen_prune_per_event"] = round(
            sum(e.get("screen_prune", 0) for e in events) / n, 1
        )
        s["events_growth_capped"] = sum(
            1 for e in events if e.get("growth_capped", 0) > 0
        )
        # churn = fraction of the population replaced per event
        churn = [
            (e["split"] + e["prune"]) / max(e["alive"], 1) for e in events
        ]
        s["mean_churn_per_event"] = round(sum(churn) / len(churn), 3)
    print(json.dumps(s, indent=2))
    return s


if __name__ == "__main__":
    main()
