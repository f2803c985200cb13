"""Benchmark: fwd+bwd rays/s at 1M Gaussians, 800x800, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference trains at ~1 s/iteration for a 3-camera
batch of 400x266-ish images on a GTX 1660 Super (2025_11_06 seminar note), i.e.
~3.2e5 rays/s fwd+bwd. vs_baseline = ours / 3.2e5.

Extra diagnostic fields go to stderr, never stdout.
"""

import json
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_S = 3 * 400 * 266 / 1.0  # ~3.19e5 (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    # persistent compile cache (same dir as quality_run): the 1M-gaussian
    # step costs ~2 min of remote compile per fresh graph
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.render import RenderConfig
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer
    from simplegaussiansplat_tk71_tpu.train.trainer import make_train_step

    log("devices:", jax.devices())
    W = H = 800
    N = 1_000_000
    f = 600.0
    rng = np.random.default_rng(0)

    # synthetic 1M-gaussian scene: uniform over the view frustum (z in
    # [4, 12], x/y spanning the full image at each depth) so per-tile loads
    # are realistic rather than center-concentrated
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
    K = jnp.asarray(np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))

    import os

    cfg = TrainConfig()
    rcfg = RenderConfig(
        tile_size=16,
        max_per_tile=int(os.environ.get("SGS_BENCH_K", "1024")),
        # 2^21 = ~1.07x the scene's actual pair count (1.96M). Every
        # pair-sized op scales with this STATIC capacity — and lax.sort
        # PADS TO THE NEXT POWER OF TWO, so the r1-r4 value of 2.2M
        # silently sorted 4.19M rows (measured: 2.2M -> 2.048M buffer cut
        # 108.9 -> 95.1 ms/step, entirely the two sorts). Keep max_pairs at
        # or just under a power of two; overflow is counted in
        # aux.dropped_pairs, never silent (VERDICT r4 next #2)
        max_pairs=int(os.environ.get("SGS_BENCH_MAX_PAIRS", str(2**21))),
        tile_chunk=125,
        use_pallas=os.environ.get("SGS_BENCH_PALLAS", "1") == "1",
        # official-3DGS alpha floor: pairs that cannot reach 1/255 anywhere
        # in their tile are culled at binning (exact conservative test)
        cull_alpha_min=float(os.environ.get("SGS_BENCH_CULL", str(1 / 255))),
    )
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, rcfg, (W, H), opt)

    params = model.trainable()
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(model.capacity)

    log("compiling...")
    t0 = time.time()
    out = step(params, model.alive, opt_state, stats, P, K, target)
    jax.block_until_ready(out)
    log(f"first step (compile): {time.time() - t0:.1f}s")
    p, o, s, m = out
    log(
        "metrics:",
        {k: float(v) for k, v in m.items() if getattr(v, "ndim", 0) == 0},
    )

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        p, o, s, m = step(p, model.alive, o, s, P, K, target)
    # host fetch, not block_until_ready: the axon tunnel's block_until_ready
    # does not reliably sync (benchmarks/micro_sort_check2.py); the steps
    # are chained through p/o/s so one scalar fetch syncs them all
    # (~26 ms RPC overhead amortized over the loop)
    float(m["loss"])
    dt = (time.time() - t0) / iters
    rays_per_s = W * H / dt
    log(f"steady-state: {dt * 1e3:.1f} ms/step -> {rays_per_s:.3e} rays/s")

    print(
        json.dumps(
            {
                "metric": "rays_per_s_per_chip_fwd_bwd_1M_800x800",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / REFERENCE_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
