"""Train-step attribution at bench scale: grad pass vs optimizer vs full.

Chained-rep harness (NOTES.md). SGS_DONATE=0 disables donation for A/B.
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

    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render_params
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.loss import photometric_loss
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
    sh = np.array(model.sh)
    sh[:N, 0:3] = rng.uniform(0.5, 3.0, size=(N, 3))
    model = model._replace(sh=jnp.asarray(sh))
    P = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    K = jnp.asarray(
        np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32)
    )
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    cfg = TrainConfig()
    rcfg = RenderConfig(
        tile_size=16, max_per_tile=1024, max_pairs=2200000, tile_chunk=125,
        use_pallas=True,
    )
    opt = make_optimizer(cfg)
    params = model.trainable()
    alive = model.alive
    opt_state = opt.init(params)

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
    def noop(c0, x):
        def fb(_, c):
            return c + x[0, 0].astype(jnp.int32) % 2

        return jax.lax.fori_loop(0, R, fb, c0)

    float(noop(jnp.int32(0), target[0, :, :, 0]))
    t0 = time.time()
    float(noop(jnp.int32(1), target[0, :, :, 0]))
    overhead[0] = (time.time() - t0) * 1e3
    log(f"fetch overhead: {overhead[0]:.1f} ms")

    def loss_fn(p):
        images, aux = render_params(p, alive, P, K, (W, H), rcfg)
        return photometric_loss(images, target)[0]

    # 1. fwd+bwd only (no optimizer)
    def gb(c, p):
        p = dict(p, mean=p["mean"] + (c % 2).astype(jnp.float32) * 0.0001)
        l, g = jax.value_and_grad(loss_fn)(p)
        return g["mean"][12345, 0].astype(jnp.int32) + c

    bench("value_and_grad", gb, (params,))

    # 2. optimizer update only (fake grads = params scaled)
    grads = jax.tree.map(lambda x: x * 1e-3, params)

    def ob(c, g, s, p):
        g = dict(g, mean=g["mean"] + (c % 2).astype(jnp.float32) * 1e-6)
        updates, s2 = opt.update(g, s, p)
        return updates["mean"][123, 0].astype(jnp.int32) + c

    bench("opt_update", ob, (grads, opt_state, params))

    # 3. SH color eval fwd+bwd only
    from simplegaussiansplat_tk71_tpu.ops import projection

    def pb(c, p):
        p = dict(p, mean=p["mean"] + (c % 2).astype(jnp.float32) * 0.0001)

        def lf(pp):
            pr = projection.project(
                pp["mean"], pp["quat"], pp["log_scale"], pp["logit_opacity"],
                pp["sh"], P, K, (W, H), sh_degree=2, alive=alive,
            )
            return jnp.sum(pr.color * 1e-6) + jnp.sum(pr.mean2d * 1e-6)

        g = jax.grad(lf)(p)
        return g["sh"][123, 0].astype(jnp.int32) + c

    bench("projection_fwdbwd", pb, (params,))


if __name__ == "__main__":
    main()
