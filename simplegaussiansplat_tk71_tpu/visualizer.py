"""Live training visualizer.

Reference: gs_visualizer.py — a matplotlib interactive imshow window updated
with the latest render (instantiation commented out in its controller,
gs_control.py:150,216). Same capability here, headless-safe: if no display is
available the update() becomes a PNG dump.
"""

import os


class Visualizer:
    def __init__(self, out_path: str = "live_view.png"):
        self.out_path = out_path
        self._plt = None
        self._im = None
        try:
            import matplotlib

            if os.environ.get("DISPLAY") or os.environ.get("MPLBACKEND"):
                import matplotlib.pyplot as plt

                plt.ion()
                self._plt = plt
        except Exception:
            self._plt = None

    def update(self, image) -> None:
        """image: (H, W, 3) float array in [0, 1]."""
        import numpy as np

        arr = np.clip(np.asarray(image), 0.0, 1.0)
        if self._plt is not None:
            if self._im is None:
                self._im = self._plt.imshow(arr)
                self._plt.show(block=False)
            else:
                self._im.set_data(arr)
            self._plt.pause(0.001)
        else:
            from simplegaussiansplat_tk71_tpu.utils.logging import save_png

            save_png(self.out_path, arr)
