"""Scaling-efficiency harness: per-step time + collective volume per layout.

Measures all three multi-chip layouts (BASELINE.md ladder items 4-5; the
reference is strictly single-GPU — SURVEY.md §2b) at 1/2/4/8 devices:

  dp      camera data-parallel (parallel/sharding.py): one camera per chip
          (weak scaling — total rays grow with N), params replicated,
          psum(grads) over ICI.
  tile    tile/ray sharding (parallel/tile_sharding.py): ONE camera's tiles
          split across chips (strong scaling — fixed total rays), psum(grads).
  gauss2d 1xN (data x gauss) mesh (parallel/gauss_sharding.py): params +
          optimizer state ZeRO-sharded over gauss, all_gather of projected
          attrs, per-chip tile slices, psum_scatter back (strong scaling).

For each (layout, n_devices) it reports steady-state step time, total rays/s,
scaling efficiency vs 1 device, and the collective operations in the compiled
HLO (op counts + byte volume), so the communication cost of each layout is
explicit even on the virtual CPU mesh where wall-clock is not TPU-predictive.

Runs UNCHANGED on real multi-chip hardware (it uses jax.devices(); the CPU
virtual mesh is only a fallback when the process has a single device), e.g.:

  python benchmarks/bench_multichip.py --devices 1,2,4,8 \
      --out docs/artifacts/multichip

Writes one JSON per layout: {layout}.json with a row per device count.
"""

import argparse
import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "token": 0,
}

# `%name = SHAPE opname(...)`; async pairs appear as op-start/op-done — count
# the -start (its operand shapes carry the transfer) and skip the -done.
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                "collective-permute", "collective-broadcast")
_INSTR_RE = re.compile(
    r"=\s+(?P<shape>\((?:[^()]|\([^)]*\))*\)|[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?)\s+"
    r"(?P<op>[a-z0-9\-]+)\("
)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def hlo_collective_stats(hlo_text: str) -> dict:
    """Per-collective-op {count, bytes} from compiled HLO text.

    Bytes = output-shape bytes of each collective instruction (the payload a
    chip receives; for all-gather that is the full gathered buffer, for
    reduce-scatter the scattered shard — matching how collective traffic is
    usually accounted per step per chip)."""
    stats = {}
    for m in _INSTR_RE.finditer(hlo_text):
        op = m.group("op")
        if op.endswith("-done"):
            continue
        base = op.removesuffix("-start")
        if base not in _COLLECTIVES:
            continue
        b = _shape_bytes(m.group("shape"))
        s = stats.setdefault(base, {"count": 0, "bytes": 0})
        s["count"] += 1
        s["bytes"] += b
    return stats


def build_scene(n: int, W: int, H: int, n_cams: int, seed: int = 0):
    import jax.numpy as jnp
    import numpy as np

    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points

    f = 0.75 * W
    rng = np.random.default_rng(seed)
    z = rng.uniform(4.0, 12.0, n).astype(np.float32)
    u = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    xyz = np.stack([u * z * W / f, v * z * H / f, z], 1).astype(np.float32)
    model = init_from_points(
        xyz, rng.uniform(0.01, 0.04, n).astype(np.float32), capacity=None
    )
    sh = np.array(model.sh)
    sh[0:3, :n] = rng.uniform(0.5, 3.0, size=(n, 3)).T
    model = model._replace(sh=jnp.asarray(sh))
    Pm = jnp.asarray(
        np.broadcast_to(np.eye(3, 4, dtype=np.float32), (n_cams, 3, 4)).copy()
    )
    Km = jnp.asarray(
        np.broadcast_to(
            np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32),
            (n_cams, 3, 3),
        ).copy()
    )
    target = jnp.asarray(
        rng.uniform(0, 1, (n_cams, H, W, 3)).astype(np.float32)
    )
    return model, Pm, Km, target


def bench_layout(layout: str, ndev: int, args):
    import jax
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
    from simplegaussiansplat_tk71_tpu.parallel.gauss_sharding import (
        make_2d_mesh,
        make_gauss_sharded_train_step,
    )
    from simplegaussiansplat_tk71_tpu.parallel.mesh import make_mesh
    from simplegaussiansplat_tk71_tpu.parallel.sharding import (
        make_sharded_train_step,
    )
    from simplegaussiansplat_tk71_tpu.parallel.tile_sharding import (
        make_tile_sharded_train_step,
    )
    from simplegaussiansplat_tk71_tpu.render import RenderConfig
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer
    from simplegaussiansplat_tk71_tpu.train.trainer import make_train_step

    W, H = args.width, args.height
    n_cams = ndev if layout == "dp" else 1
    # the gauss-sharded path pads N to the axis size internally only for
    # tiles; params must divide — round N up to a multiple of 8
    n = -(-args.n // 8) * 8
    model, Pm, Km, target = build_scene(n, W, H, n_cams)

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = TrainConfig(tile_size=16, max_per_tile=args.max_per_tile)
    rcfg = RenderConfig(
        tile_size=16,
        max_per_tile=args.max_per_tile,
        max_pairs=args.max_pairs,
        tile_chunk=25,
        use_pallas=on_tpu,
        cull_alpha_min=1 / 255,
    )
    opt = make_optimizer(cfg)
    params = model.trainable()
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(model.capacity)

    if layout == "dp":
        if ndev == 1:
            step = make_train_step(cfg, rcfg, (W, H), opt)
        else:
            step = make_sharded_train_step(
                make_mesh(ndev), cfg, rcfg, (W, H), opt
            )
    elif layout == "tile":
        if ndev == 1:
            step = make_train_step(cfg, rcfg, (W, H), opt)
        else:
            step = make_tile_sharded_train_step(
                make_mesh(ndev), cfg, rcfg, (W, H), opt
            )
    elif layout == "gauss2d":
        if ndev == 1:
            step = make_train_step(cfg, rcfg, (W, H), opt)
        else:
            step = make_gauss_sharded_train_step(
                make_2d_mesh(1, ndev), cfg, rcfg, (W, H), opt, params
            )
    else:
        raise ValueError(layout)

    ex = (params, model.alive, opt_state, stats, Pm, Km, target)
    lowered = jax.jit(step).lower(*ex) if not hasattr(step, "lower") else step.lower(*ex)
    compiled = lowered.compile()
    coll = hlo_collective_stats(compiled.as_text())

    t0 = time.time()
    p, o, s, m = step(params, model.alive, opt_state, stats, Pm, Km, target)
    jax.block_until_ready(m["loss"])
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(args.iters):
        p, o, s, m = step(p, model.alive, o, s, Pm, Km, target)
    float(m["loss"])  # single sync fetch; steps chained through p/o/s
    dt = (time.time() - t0) / args.iters

    rays = n_cams * W * H
    row = {
        "layout": layout,
        "devices": ndev,
        "cams": n_cams,
        "gaussians": n,
        "image": [W, H],
        "step_ms": round(dt * 1e3, 2),
        "rays_per_s": round(rays / dt, 1),
        "compile_s": round(compile_s, 1),
        "loss": round(float(m["loss"]), 5),
        "collectives": coll,
        "collective_bytes_total": sum(v["bytes"] for v in coll.values()),
        "backend": jax.default_backend(),
    }
    log(json.dumps(row))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--layouts", default="dp,tile,gauss2d")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--max-per-tile", type=int, default=256)
    ap.add_argument("--max-pairs", type=int, default=400_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="docs/artifacts/multichip")
    args = ap.parse_args()
    dev_counts = [int(d) for d in args.devices.split(",")]

    # virtual CPU mesh fallback: must happen before jax import
    if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"):
        pass  # real backend (tpu/axon): use its devices as-is
    else:
        need = max(dev_counts)
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={need}"
            ).strip()

    import jax

    ndev_avail = len(jax.devices())
    dev_counts = [d for d in dev_counts if d <= ndev_avail]
    log(f"backend={jax.default_backend()} devices={ndev_avail} "
        f"counts={dev_counts}")

    os.makedirs(args.out, exist_ok=True)
    for layout in args.layouts.split(","):
        rows = []
        for ndev in dev_counts:
            rows.append(bench_layout(layout, ndev, args))
        base = next((r for r in rows if r["devices"] == 1), None)
        for r in rows:
            if base is None:
                r["efficiency_vs_1dev"] = None
            else:
                # throughput scaling: rays/s at N vs N x rays/s at 1 chip
                r["efficiency_vs_1dev"] = round(
                    r["rays_per_s"] / (r["devices"] * base["rays_per_s"]), 3
                )
            if r.get("backend") == "cpu":
                # a virtual N-device mesh timeshares ONE host: step_ms /
                # efficiency measure host contention, not the design. The
                # collective-bytes accounting is exact either way (it reads
                # the compiled HLO, not the clock).
                r["timing_validity"] = (
                    "perf-invalid: shared-host virtual CPU mesh; only "
                    "collectives/collective_bytes_total are meaningful"
                )
        path = os.path.join(args.out, f"{layout}.json")
        with open(path, "w") as f:
            json.dump(rows, f, indent=2)
        log(f"wrote {path}")
        print(json.dumps({"layout": layout, "rows": rows}))


if __name__ == "__main__":
    main()
