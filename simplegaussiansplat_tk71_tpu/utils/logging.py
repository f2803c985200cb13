"""Structured training observability.

The reference's only observability is print() of loss / iteration time /
gaussian count plus a PNG dump every iteration (gs_control.py:192-223;
SURVEY.md section 5). Here: JSONL metrics stream + periodic eval renders,
usable headless.
"""

import json
import os
import time


class MetricsLogger:
    """Append-only JSONL metrics file + optional console echo."""

    def __init__(self, path: str | None = None, echo=print):
        self.path = path
        self.echo = echo
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
        else:
            self._f = None

    def log(self, step: int, **metrics):
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
        return rec

    def close(self):
        if self._f:
            self._f.close()


def save_png(path: str, image) -> None:
    """(H, W, 3) float [0,1] -> PNG (reference dumps via torchvision,
    gs_control.py:217-223)."""
    import numpy as np
    from PIL import Image

    arr = (np.clip(np.asarray(image), 0, 1) * 255).astype("uint8")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)
