"""Stage-level timing of the 1M-gaussian 800x800 train step (bench.py scene).

Chained-rep harness: R reps inside one jit with a data-dependent carry and a
single host fetch (the axon tunnel's block_until_ready does not reliably
sync; a fetch costs ~26 ms — see NOTES.md). Prints one JSON line per stage.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
    sh[0:3, :N] = rng.uniform(0.5, 3.0, size=(N, 3)).T
    model = model._replace(sh=jnp.asarray(sh))
    P = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    K = jnp.asarray(
        np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32)
    )
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    params = model.trainable()
    alive = model.alive

    overhead = [0.0]

    def bench(name, body, args):
        """body(c, *args) -> int32 scalar (data-dependent on its work)."""

        @jax.jit
        def run(c0, *a):
            def f(_, c):
                return body(c, *a)

            return jax.lax.fori_loop(0, R, f, c0)

        float(run(jnp.int32(0), *args))
        t0 = time.time()
        float(run(jnp.int32(1), *args))
        ms = ((time.time() - t0) * 1e3 - overhead[0]) / R
        print(json.dumps({"stage": name, "ms": round(ms, 2)}), flush=True)

    @jax.jit
    def noop(c0, x):
        def f(_, c):
            return c + x[0, 0].astype(jnp.int32) % 2

        return jax.lax.fori_loop(0, R, f, c0)

    float(noop(jnp.int32(0), target[0, :, :, 0]))
    t0 = time.time()
    float(noop(jnp.int32(1), target[0, :, :, 0]))
    overhead[0] = (time.time() - t0) * 1e3
    log(f"fetch overhead: {overhead[0]:.1f} ms")

    # --- projection ---
    def proj_fn(p, c):
        return projection.project(
            p["mean"] + (c % 2).astype(jnp.float32),
            p["quat"], p["log_scale"], p["logit_opacity"],
            p["sh"], P, K, (W, H), sh_degree=2, bbox_max_frac=0.4, alive=alive,
        )

    bench(
        "projection_fwd",
        lambda c, p: proj_fn(p, c).depth[0, 123].astype(jnp.int32) + c,
        (params,),
    )
    proj = jax.jit(lambda p: proj_fn(p, jnp.int32(0)))(params)
    m2, bb, dp, vl = (
        proj.mean2d[0], proj.bbox_half[0], proj.depth[0], proj.valid[0],
    )

    packed = jnp.concatenate(
        [m2, proj.conic[0], proj.opacity[0][None], proj.color[0]], axis=0
    )  # (9, N) component-major

    # --- binning (routed: attrs + segment key ride the sort) ---
    def bins_fn(m2, bb, dp, vl, c):
        b = binning.bin_gaussians(
            m2 + (c % 2).astype(jnp.float32), bb, dp, vl, (W, H),
            tile_size=16, max_pairs=max_pairs, max_per_tile=Kmax,
            build_table=False, attrs=packed,
        )
        return b

    bench(
        "binning_routed",
        lambda c, *a: bins_fn(*a, c).gid_s[12345] % 7
        + bins_fn(*a, c).attrs_s[3, 1234].astype(jnp.int32) + c,
        (m2, bb, dp, vl),
    )
    bench(
        "binning_with_table",
        lambda c, *a: binning.bin_gaussians(
            a[0] + (c % 2).astype(jnp.float32), a[1], a[2], a[3], (W, H),
            tile_size=16, max_pairs=max_pairs, max_per_tile=Kmax,
            build_table=True,
        ).ids[123, 17] % 7 + c,
        (m2, bb, dp, vl),
    )
    bins = jax.jit(
        lambda *a: bins_fn(*a, jnp.int32(0))
    )(m2, bb, dp, vl)
    log("pairs:", int(bins.num_pairs), "dropped:", int(bins.dropped_pairs),
        "truncated:", int(bins.truncated))

    # --- rasterize fwd (routed: pair gather + window kernel + composite) ---
    def raster_fwd(c, m2, conic, color, op):
        img = rasterize_tiles_pallas(
            None, None, m2 + (c % 2).astype(jnp.float32), conic, color, op,
            (W, H), tile_size=16, pixel_offset=0.5, route=bins,
            max_per_tile=Kmax,
        )
        return img[123, 456, 1].astype(jnp.int32) + c

    bench(
        "raster_fwd_routed", raster_fwd,
        (m2, proj.conic[0], proj.color[0], proj.opacity[0]),
    )

    # --- rasterize fwd+bwd (routed) ---
    def raster_fwdbwd(c, m2, conic, color, op):
        def lf(m, cc, col, o):
            img = rasterize_tiles_pallas(
                None, None, m, cc, col, o, (W, H), tile_size=16,
                pixel_offset=0.5, route=bins, max_per_tile=Kmax,
            )
            return jnp.sum(img * target[0])

        g = jax.grad(lf, argnums=(0, 1, 2, 3))(
            m2 + (c % 2).astype(jnp.float32), conic, color, op
        )
        return g[0][0, 12345].astype(jnp.int32) + c

    bench(
        "raster_fwdbwd_routed", raster_fwdbwd,
        (m2, proj.conic[0], proj.color[0], proj.opacity[0]),
    )

    # --- loss fwd+bwd ---
    def loss_grad(c, im):
        g = jax.grad(lambda x: photometric_loss(x, target)[0])(
            im + (c % 2).astype(jnp.float32)
        )
        return g[0, 123, 456, 1].astype(jnp.int32) + c

    bench("loss_fwdbwd", loss_grad, (target * 0.5,))

    # --- full train step (chained through params) ---
    cfg = TrainConfig()
    rcfg = RenderConfig(
        tile_size=16, max_per_tile=Kmax, max_pairs=max_pairs,
        tile_chunk=125, use_pallas=True,
    )
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, rcfg, (W, H), opt)
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(model.capacity)

    out = step(params, alive, opt_state, stats, P, K, target)
    float(out[3]["loss"])  # compile + sync
    p, o, s, m = out
    t0 = time.time()
    for _ in range(R):
        p, o, s, m = step(p, alive, o, s, P, K, target)
    float(m["loss"])
    ms = ((time.time() - t0) * 1e3) / R
    print(json.dumps({"stage": "full_step", "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
