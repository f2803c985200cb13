"""Ablation timing of the full train step at bench scale: forward-only loss,
value_and_grad, full step — the deltas attribute costs that the per-stage
profilers (which bench each op in isolation) cannot see, e.g. XLA scheduling
gaps between the sort and the kernels.
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
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render_params
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.loss import photometric_loss
    from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer
    from simplegaussiansplat_tk71_tpu.train.trainer import make_train_step

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

    cfg = TrainConfig()
    rcfg = RenderConfig(
        tile_size=16, max_per_tile=1024, max_pairs=2_200_000,
        tile_chunk=125, use_pallas=True,
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

    def loss_of(p):
        images, aux = render_params(p, alive, P, K, (W, H), rcfg)
        loss, _ = photometric_loss(images, target, cfg.loss_lambda, cfg.ssim_window)
        return loss

    # 1. forward-only loss
    def fwd_only(c, p):
        p2 = dict(p)
        p2["mean"] = p["mean"] + (c % 2).astype(jnp.float32) * 1e-6
        return (loss_of(p2) * 1e6).astype(jnp.int32) % 97 + c

    bench("loss_forward", fwd_only, (params,))

    # 2. value_and_grad
    def vag(c, p):
        p2 = dict(p)
        p2["mean"] = p["mean"] + (c % 2).astype(jnp.float32) * 1e-6
        l, g = jax.value_and_grad(loss_of)(p2)
        return (
            (l * 1e6).astype(jnp.int32) % 97
            + g["mean"][0, 123].astype(jnp.int32)
            + g["sh"][3, 456].astype(jnp.int32)
            + c
        )

    bench("loss_value_and_grad", vag, (params,))

    # 3. full train step (params chained through the carry)
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, rcfg, (W, H), opt)
    os.environ["SGS_DONATE"] = "1"
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(model.capacity)
    out = step(params, alive, opt_state, stats, P, K, target)
    float(out[3]["loss"])
    p, o, s, m = out
    t0 = time.time()
    for _ in range(2 * R):
        p, o, s, m = step(p, alive, o, s, P, K, target)
    float(m["loss"])
    ms = ((time.time() - t0) * 1e3) / (2 * R)
    print(json.dumps({"stage": "full_step", "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
