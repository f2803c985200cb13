"""Capture a jax.profiler device trace of the bench train step and print the
top HLO ops by self time (tensorboard_plugin_profile converters)."""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
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

    cfg = TrainConfig()
    # mirror bench.py's config (incl. its env knobs) so the trace anchors
    # the same step the BENCH_r* numbers measure
    rcfg = RenderConfig(
        tile_size=16,
        max_per_tile=int(os.environ.get("SGS_BENCH_K", "1024")),
        max_pairs=int(os.environ.get("SGS_BENCH_MAX_PAIRS", str(2**21))),
        tile_chunk=125,
        use_pallas=True,
        cull_alpha_min=float(os.environ.get("SGS_BENCH_CULL", str(1 / 255))),
    )
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, rcfg, (W, H), opt)
    params = model.trainable()
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(model.capacity)
    out = step(params, model.alive, opt_state, stats, P, K, target)
    float(out[3]["loss"])
    p, o, s, m = out

    tdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    for _ in range(3):
        p, o, s, m = step(p, model.alive, o, s, P, K, target)
    float(m["loss"])
    jax.profiler.stop_trace()
    log("trace captured")

    # find the xplane and convert to op stats
    xs = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    log("xplanes:", xs)
    if not xs:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(xs, "hlo_op_profile", {})
        open("/tmp/hlo_op_profile.json", "w").write(
            data if isinstance(data, str) else data.decode()
        )
        log("wrote /tmp/hlo_op_profile.json")
    except Exception as e:
        log("hlo_op_profile failed:", e)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(xs, "trace_viewer", {})
        out_path = "/tmp/trace_viewer.json.gz"
        raw = data if isinstance(data, bytes) else data.encode()
        open(out_path, "wb").write(raw)
        log("wrote", out_path, len(raw))
    except Exception as e:
        log("trace_viewer failed:", e)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(xs, "op_stats", {})
        open("/tmp/op_stats.json", "w").write(
            data if isinstance(data, str) else str(data)
        )
        log("wrote /tmp/op_stats.json")
    except Exception as e:
        log("op_stats failed:", e)


if __name__ == "__main__":
    main()
