"""Generate a complete, runnable example COLMAP bundle (component C16).

The reference ships `colmap/` (the 100-image south-building scene) as its
dataset bundle, but upstream stripped images.bin, so it cannot be trained
as-shipped. This script produces a small bundle that CAN: a synthesized
courtyard capture serialized to the exact COLMAP binary layout + PNGs.

  python examples/make_example_scene.py [--out examples/scene_mini] \
      [--cams 12] [--width 160 --height 120]

Then train it end-to-end:

  python -m simplegaussiansplat_tk71_tpu.cli train \
      --scene examples/scene_mini --out /tmp/mini_run --iterations 2000
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples/scene_mini")
    ap.add_argument("--cams", type=int, default=12)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--sfm-points", type=int, default=1500)
    args = ap.parse_args()

    from simplegaussiansplat_tk71_tpu.data.colmap_write import write_capture_scene
    from simplegaussiansplat_tk71_tpu.data.synthetic import (
        make_courtyard_capture,
        render_capture_images,
    )
    from simplegaussiansplat_tk71_tpu.render import RenderConfig

    cap = make_courtyard_capture(
        n_cams=args.cams, width=args.width, height=args.height,
        gt_points_scale=0.15, sfm_points=args.sfm_points,
    )
    cfg = RenderConfig(max_per_tile=512, max_pairs=1_500_000, use_pallas=False)
    images = render_capture_images(cap, cfg, batch=2)
    write_capture_scene(args.out, cap, images)
    print(f"wrote {args.cams}-camera scene to {args.out} "
          f"({int(cap.gt_model.num_alive())} GT gaussians, "
          f"{len(cap.sfm_xyz)} SfM points)")


if __name__ == "__main__":
    main()
