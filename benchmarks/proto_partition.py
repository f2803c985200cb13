"""Viability analysis for the MSB-partition binning sort (NOTES backlog 2b).

Question: after Morton-ordering the gaussians, how tile-coherent is the
gaussian-major pair stream? The partition design only beats the global
lax.sort if per-bucket runs are long enough that cursor-window DMAs move
large contiguous chunks.

Method: project a realistic capture (data/synthetic.py courtyard) for one
camera, expand (gaussian, tile) pairs in gaussian-major order exactly like
ops/binning (row-major rect walk per gaussian), and measure the run-length
distribution of the pair stream's bucket ids (bucket = tile >> shift, i.e.
tile-row groups) for 8/16/32 buckets — original insertion order vs
Morton order.

CPU-only, no TPU needed:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python benchmarks/proto_partition.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_lengths(x: np.ndarray) -> np.ndarray:
    if len(x) == 0:
        return np.zeros(0, np.int64)
    change = np.flatnonzero(np.diff(x)) + 1
    bounds = np.concatenate([[0], change, [len(x)]])
    return np.diff(bounds)


def pair_stream_tiles(mean2d, bbox_half, valid, W, H, ts=16):
    """Gaussian-major (gaussian, tile) pair expansion, like ops/binning."""
    ntx, nty = -(-W // ts), -(-H // ts)
    x0 = np.clip(((mean2d[0] - bbox_half[0]) // ts).astype(int), 0, ntx - 1)
    x1 = np.clip(((mean2d[0] + bbox_half[0]) // ts).astype(int), 0, ntx - 1)
    y0 = np.clip(((mean2d[1] - bbox_half[1]) // ts).astype(int), 0, nty - 1)
    y1 = np.clip(((mean2d[1] + bbox_half[1]) // ts).astype(int), 0, nty - 1)
    tiles = []
    for i in np.flatnonzero(valid):
        tx = np.arange(x0[i], x1[i] + 1)
        ty = np.arange(y0[i], y1[i] + 1)
        tiles.append((ty[:, None] * ntx + tx[None, :]).ravel())
    return np.concatenate(tiles) if tiles else np.zeros(0, int), ntx * nty


def main():
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.adaptive.reorder import morton_codes
    from simplegaussiansplat_tk71_tpu.data.synthetic import make_courtyard_capture
    from simplegaussiansplat_tk71_tpu.ops.projection import project

    W, H = 400, 266
    cap = make_courtyard_capture(n_cams=4, width=W, height=H,
                                 gt_points_scale=0.5, sfm_points=1000)
    gt = cap.gt_model
    n = int(gt.num_alive())
    print(f"scene: {n} gaussians, image {W}x{H}", file=sys.stderr)

    proj = project(
        gt.mean, gt.quat, gt.log_scale, gt.logit_opacity, gt.sh,
        jnp.asarray(cap.P[:1]), jnp.asarray(cap.K[:1]), (W, H),
        alive=gt.alive,
    )
    mean2d = np.asarray(proj.mean2d[0])
    bbox = np.asarray(proj.bbox_half[0])
    valid = np.asarray(proj.valid[0])

    mean_cn = np.asarray(gt.mean)
    for label, order in [
        ("insertion", np.arange(mean_cn.shape[1])),
        ("morton", np.argsort(morton_codes(mean_cn.T))),
    ]:
        stream, T = pair_stream_tiles(
            mean2d[:, order], bbox[:, order], valid[order], W, H
        )
        out = {"order": label, "pairs": int(len(stream)), "tiles": int(T)}
        for nb in (8, 16, 32):
            shift = max((T - 1).bit_length() - int(np.log2(nb)), 0)
            rl = run_lengths(stream >> shift)
            out[f"runlen_mean_b{nb}"] = round(float(rl.mean()), 2)
            out[f"runlen_p90_b{nb}"] = int(np.percentile(rl, 90))
        import json

        print(json.dumps(out))


if __name__ == "__main__":
    main()
