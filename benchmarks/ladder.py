"""The benchmark ladder (BASELINE.md / BASELINE.json configs).

Each rung is runnable standalone:

  python benchmarks/ladder.py --rung 1   # ~1k gaussians, 128x128, CPU parity path
  python benchmarks/ladder.py --rung 2   # 10k gaussians, 400x400, forward only
  python benchmarks/ladder.py --rung 3   # 100k gaussians (bundled scene init), fwd+bwd, 1 chip
  python benchmarks/ladder.py --rung 4   # 1M gaussians, tiles sharded across local devices
  python benchmarks/ladder.py --rung 5   # 1M + densify, sharded mesh (scaled-down on 1 chip)

Prints one JSON line per rung. bench.py remains the driver's headline metric.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _scene(n, W, H, f, seed=0, scale_lo=0.004, scale_hi=0.02):
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points

    rng = np.random.default_rng(seed)
    z = rng.uniform(4.0, 12.0, n).astype(np.float32)
    u = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    xyz = np.stack([u * z * W / f, v * z * H / f, z], 1).astype(np.float32)
    model = init_from_points(
        xyz, rng.uniform(scale_lo, scale_hi, n).astype(np.float32)
    )
    sh = np.array(model.sh)
    sh[0:3, :n] = rng.uniform(0.5, 3.0, size=(n, 3)).T
    model = model._replace(sh=jnp.asarray(sh))
    P = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    K = jnp.asarray(
        np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32)
    )
    return model, P, K


def _steady(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    s = float(jax.tree.leaves(out)[0].sum())  # force materialization
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        s = float(jax.tree.leaves(out)[0].sum())
    return (time.time() - t0) / n


def rung1():
    """~1k synthetic gaussians -> 128x128, pure-jnp parity path."""
    import jax

    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render

    W = H = 128
    model, P, K = _scene(1000, W, H, f=120.0, scale_lo=0.02, scale_hi=0.08)
    cfg = RenderConfig(max_per_tile=256, tile_chunk=16)
    fn = jax.jit(lambda m: render(m, P, K, (W, H), cfg)[0])
    dt = _steady(fn, model)
    return {"rung": 1, "metric": "fwd_s", "value": round(dt, 5), "rays": W * H}


def rung2():
    """10k gaussians, single 400x400 camera, full pipeline forward."""
    import jax

    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render

    W = H = 400
    model, P, K = _scene(10_000, W, H, f=350.0)
    cfg = RenderConfig(max_per_tile=256, tile_chunk=125, use_pallas=_tpu())
    fn = jax.jit(lambda m: render(m, P, K, (W, H), cfg)[0])
    dt = _steady(fn, model)
    return {
        "rung": 2, "metric": "fwd_rays_per_s", "value": round(W * H / dt, 1),
    }


def rung3():
    """100k gaussians initialized from the bundled scene's point cloud,
    full fwd+bwd step on one chip."""
    import jax
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.data.colmap import read_points3d_bin
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render_params
    from simplegaussiansplat_tk71_tpu.train.loss import photometric_loss
    from simplegaussiansplat_tk71_tpu.utils.knn import knn_mean_dist

    W, H = 640, 427
    rng = np.random.default_rng(0)
    try:
        xyz, _ = read_points3d_bin(
            "/root/reference/colmap/sparse/0/points3D.bin"
        )
        reps = -(-100_000 // len(xyz))
        xyz = np.tile(xyz, (reps, 1))[:100_000]
        xyz += rng.normal(0, 0.05, xyz.shape)
        xyz = xyz.astype(np.float32)
    except Exception:
        xyz = rng.normal(size=(100_000, 3)).astype(np.float32) * 3
        xyz[:, 2] += 6
    model = init_from_points(xyz, knn_mean_dist(xyz, 3))
    f = 424.0
    P = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    K = jnp.asarray(
        np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32)
    )
    target = jnp.zeros((1, H, W, 3))
    cfg = RenderConfig(max_per_tile=512, tile_chunk=110, use_pallas=_tpu())

    def loss(p):
        im, _ = render_params(p, model.alive, P, K, (W, H), cfg)
        return photometric_loss(im, target)[0]

    fn = jax.jit(jax.grad(loss))
    dt = _steady(fn, model.trainable(), n=3)
    return {
        "rung": 3, "metric": "fwdbwd_rays_per_s", "value": round(W * H / dt, 1),
    }


def rung4():
    """1M gaussians, tiles sharded across all local devices."""
    import jax

    from simplegaussiansplat_tk71_tpu.parallel.mesh import make_mesh
    from simplegaussiansplat_tk71_tpu.parallel.tile_sharding import (
        make_tile_sharded_train_step,
    )
    from simplegaussiansplat_tk71_tpu.render import RenderConfig
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer
    from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
    import jax.numpy as jnp

    n_dev = len(jax.devices())
    W = H = 800
    model, P, K = _scene(1_000_000, W, H, f=600.0)
    cfg = TrainConfig()
    rcfg = RenderConfig(max_per_tile=1024, max_pairs=4_000_000, tile_chunk=125)
    opt = make_optimizer(cfg)
    mesh = make_mesh(n_dev)
    step = make_tile_sharded_train_step(mesh, cfg, rcfg, (W, H), opt)
    params = model.trainable()
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    fn = lambda p, o, s: step(p, model.alive, o, s, P, K, target)[:1]
    dt = _steady(
        fn, params, opt.init(params), DensifyStats.zeros(model.capacity), n=3
    )
    return {
        "rung": 4, "metric": "fwdbwd_rays_per_s", "devices": n_dev,
        "value": round(W * H / dt, 1),
    }


def rung5():
    """Adaptive densify in the loop on a sharded mesh (scaled for CI)."""
    import jax
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.adaptive.densify import (
        DensifyStats, densify_and_prune,
    )
    from simplegaussiansplat_tk71_tpu.parallel.mesh import make_mesh
    from simplegaussiansplat_tk71_tpu.parallel.sharding import (
        make_sharded_train_step,
    )
    from simplegaussiansplat_tk71_tpu.render import RenderConfig
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer

    n_dev = len(jax.devices())
    W = H = 256
    model, P0, K0 = _scene(200_000, W, H, f=220.0)
    rng = np.random.default_rng(0)
    Pm = jnp.tile(P0, (n_dev, 1, 1))
    Km = jnp.tile(K0, (n_dev, 1, 1))
    target = jnp.asarray(
        rng.uniform(0, 1, (n_dev, H, W, 3)).astype(np.float32)
    )
    cfg = TrainConfig()
    rcfg = RenderConfig(max_per_tile=512, tile_chunk=64)
    opt = make_optimizer(cfg)
    mesh = make_mesh(n_dev)
    step = make_sharded_train_step(mesh, cfg, rcfg, (W, H), opt)
    params = model.trainable()
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(model.capacity)
    t0 = time.time()
    for i in range(3):
        params, opt_state, stats, m = step(
            params, model.alive, opt_state, stats, Pm, Km, target
        )
    model = model.with_trainable(jax.tree.map(lambda x: x, params))
    model, stats, info = densify_and_prune(model, stats, 10.0)
    dt = time.time() - t0
    return {
        "rung": 5, "metric": "steps3_plus_densify_s", "devices": n_dev,
        "value": round(dt, 3), "alive_after": info["alive"],
    }


def _tpu() -> bool:
    import jax

    return jax.devices()[0].platform != "cpu"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rung", type=int, required=True, choices=[1, 2, 3, 4, 5])
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    out = {1: rung1, 2: rung2, 3: rung3, 4: rung4, 5: rung5}[args.rung]()

    out["backend"] = jax.default_backend()
    if out["backend"] == "cpu" and args.rung >= 3:
        out["timing_validity"] = (
            "perf-invalid: CPU (virtual mesh for rungs 4-5 timeshares one "
            "host); rung defined for TPU hardware"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
