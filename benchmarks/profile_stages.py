"""Stage-level timing of the 1M-gaussian 800x800 train step (bench.py scene).

Times each pipeline stage in isolation (own jit, block_until_ready) plus the
full step, so optimization effort goes where the milliseconds are. Prints one
JSON line per stage to stdout.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.ops import binning, projection
    from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
        rasterize_tiles_pallas,
    )
    from simplegaussiansplat_tk71_tpu.render import RenderConfig
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.loss import photometric_loss
    from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer
    from simplegaussiansplat_tk71_tpu.train.trainer import make_train_step

    log("devices:", jax.devices())
    W = H = 800
    N = 1_000_000
    f = 600.0
    Kmax = int(os.environ.get("SGS_BENCH_K", "1024"))
    max_pairs = int(os.environ.get("SGS_BENCH_MAX_PAIRS", "2500000"))
    rng = np.random.default_rng(0)
    z = rng.uniform(4.0, 12.0, N).astype(np.float32)
    u = rng.uniform(-0.5, 0.5, N).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, N).astype(np.float32)
    xyz = np.stack([u * z * W / f, v * z * H / f, z], axis=1).astype(np.float32)
    model = init_from_points(
        xyz, rng.uniform(0.004, 0.02, N).astype(np.float32), capacity=None
    )
    sh = np.array(model.sh)
    sh[:N, 0] = rng.uniform(0.5, 3.0, size=(N, 3))
    model = model._replace(sh=jnp.asarray(sh))
    P = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    K = jnp.asarray(
        np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32)
    )
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    params = model.trainable()
    alive = model.alive

    # --- projection ---
    def proj_fn(p):
        return projection.project(
            p["mean"], p["quat"], p["log_scale"], p["logit_opacity"],
            p["sh"], P, K, (W, H), sh_degree=2, bbox_max_frac=0.4, alive=alive,
        )

    proj = timeit("projection_fwd", jax.jit(proj_fn), params)

    # --- binning ---
    def bins_fn(mean2d, bbox_half, depth, valid):
        return binning.bin_gaussians(
            mean2d, bbox_half, depth, valid, (W, H),
            tile_size=16, max_pairs=max_pairs, max_per_tile=Kmax,
        )

    bins = timeit(
        "binning", jax.jit(bins_fn),
        proj.mean2d[0], proj.bbox_half[0], proj.depth[0], proj.valid[0],
    )
    log("pairs:", int(bins.num_pairs), "dropped:", int(bins.dropped_pairs),
        "truncated:", int(bins.truncated))

    # --- rasterize fwd (includes attr gather) ---
    def raster_fn(mean2d, conic, color, opacity):
        return rasterize_tiles_pallas(
            bins.ids, bins.mask, mean2d, conic, color, opacity, (W, H),
            tile_size=16, pixel_offset=0.5,
        )

    img = timeit(
        "raster_fwd_total", jax.jit(raster_fn),
        proj.mean2d[0], proj.conic[0], proj.color[0], proj.opacity[0],
    )

    # --- rasterize fwd+bwd ---
    def raster_grad(mean2d, conic, color, opacity):
        def lf(m, c, col, op):
            return jnp.sum(raster_fn(m, c, col, op) ** 2)

        return jax.grad(lf, argnums=(0, 1, 2, 3))(mean2d, conic, color, opacity)

    timeit(
        "raster_fwdbwd_total", jax.jit(raster_grad),
        proj.mean2d[0], proj.conic[0], proj.color[0], proj.opacity[0],
    )

    # --- loss (L1 + SSIM) fwd+bwd ---
    def loss_grad(im):
        return jax.grad(lambda x: photometric_loss(x, target)[0])(im)

    timeit("loss_fwdbwd", jax.jit(loss_grad), target * 0.5)

    # --- full train step ---
    cfg = TrainConfig()
    rcfg = RenderConfig(
        tile_size=16, max_per_tile=Kmax, max_pairs=max_pairs,
        tile_chunk=125, use_pallas=True,
    )
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, rcfg, (W, H), opt)
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(model.capacity)

    def full(p, o, s):
        return step(p, alive, o, s, P, K, target)

    timeit("full_step", full, params, opt_state, stats, n=10)


if __name__ == "__main__":
    main()
