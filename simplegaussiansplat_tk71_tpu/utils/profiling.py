"""Profiling / tracing hooks.

Reference equivalent: wall-clock prints per iteration and CUDA memory probes
(gs_control.py:155-213, uitility.py:15-18; SURVEY.md section 5). Here:
jax.profiler trace capture (viewable in TensorBoard/Perfetto) plus a
lightweight step timer with percentile summaries.
"""

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: with profiling.trace('/tmp/trace'): step()."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Collects per-step wall times; summary() gives mean/p50/p90."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {
            "steps": len(a),
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p90_s": float(np.percentile(a, 90)),
            "total_s": float(a.sum()),
        }


def device_memory_stats() -> dict:
    """Per-device memory stats (the gpu_mem analog, uitility.py:15-18)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
        except Exception:
            pass
    return out
