"""Timing of the non-raster train-step tail at bench scale: projection
forward, projection fwd+bwd chain (VJP through conic/color to the 5 leaf
params), Adam update, densify-stats accumulation.

Chained-rep harness (NOTES.md): R reps inside one jit, one scalar fetch.
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
    import optax

    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.ops import projection
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer

    log("devices:", jax.devices())
    W = H = 800
    N = 1_000_000
    f = 600.0
    rng = np.random.default_rng(0)
    z = rng.uniform(4.0, 12.0, N).astype(np.float32)
    u = rng.uniform(-0.5, 0.5, N).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, N).astype(np.float32)
    xyz = np.stack([u * z * W / f, v * z * H / f, z], axis=1).astype(np.float32)
    model = init_from_points(
        xyz, rng.uniform(0.004, 0.02, N).astype(np.float32), capacity=None
    )
    params = model.trainable()
    alive = model.alive
    Pm = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    Km = jnp.asarray(
        np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32)
    )

    overhead = [0.0]

    def bench(name, body, args):
        @jax.jit
        def run(c0, *a):
            def fb(_, c):
                return body(c, *a)

            return jax.lax.fori_loop(0, R, fb, c0)

        float(run(jnp.int32(0), *args))
        t0 = time.time()
        float(run(jnp.int32(1), *args))
        ms = ((time.time() - t0) * 1e3 - overhead[0]) / R
        print(json.dumps({"stage": name, "ms": round(ms, 2)}), flush=True)

    @jax.jit
    def cal(c0, x):
        return jax.lax.fori_loop(
            0, R, lambda _, c: c + x["mean"][0, 0].astype(jnp.int32) % 2, c0
        )

    float(cal(jnp.int32(0), params))
    t0 = time.time()
    float(cal(jnp.int32(1), params))
    overhead[0] = (time.time() - t0) * 1e3
    log(f"fetch overhead: {overhead[0]:.1f} ms")

    def proj_of(p):
        return projection.project(
            p["mean"], p["quat"], p["log_scale"], p["logit_opacity"], p["sh"],
            Pm, Km, (W, H), sh_degree=2, bbox_max_frac=0.4, alive=alive,
        )

    # --- projection forward (checksum over several outputs defeats DCE) ---
    def pf(c, p):
        p2 = dict(p)
        p2["mean"] = p["mean"] + (c % 2).astype(jnp.float32)
        pr = proj_of(p2)
        return (
            pr.mean2d[0, 0, 123].astype(jnp.int32)
            + pr.conic[0, 1, 456].astype(jnp.int32)
            + pr.color[0, 2, 789].astype(jnp.int32)
            + pr.bbox_half[0, 0, 1000].astype(jnp.int32)
            + pr.valid[0, 2000].astype(jnp.int32)
            + pr.opacity[0, 77].astype(jnp.int32)
            + c
        )

    bench("projection_fwd_full", pf, (params,))

    # --- projection fwd+bwd (cotangents on every rasterizer input) ---
    def pb(c, p):
        def lf(p2):
            pr = proj_of(p2)
            return (
                jnp.sum(pr.mean2d) * 1e-6
                + jnp.sum(pr.conic) * 1e-7
                + jnp.sum(pr.color) * 1e-6
                + jnp.sum(pr.opacity) * 1e-6
            )

        p2 = dict(p)
        p2["mean"] = p["mean"] + (c % 2).astype(jnp.float32)
        g = jax.grad(lf)(p2)
        return g["mean"][0, 123].astype(jnp.int32) + g["sh"][3, 456].astype(
            jnp.int32
        ) + c

    bench("projection_fwdbwd", pb, (params,))

    # --- Adam update over the 5 (C, N) leaves ---
    cfg = TrainConfig()
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    grads = jax.tree.map(lambda x: x * 1e-3, params)

    def ad(c, p, g, st):
        g2 = jax.tree.map(lambda x: x + (c % 2).astype(jnp.float32), g)
        up, st2 = opt.update(g2, st, p)
        p2 = jax.tree.map(lambda a, b: a + b, p, up)
        return p2["mean"][0, 123].astype(jnp.int32) + c

    bench("adam_update", ad, (params, grads, opt_state))

    # --- densify stats accumulation ---
    def ds(c, g):
        gn = jnp.linalg.norm(g["mean"] + (c % 2).astype(jnp.float32), axis=0)
        return gn[12345].astype(jnp.int32) + c

    bench("densify_stats", ds, (grads,))


if __name__ == "__main__":
    main()
