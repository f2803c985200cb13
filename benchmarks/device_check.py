"""Device-correctness harness: run the fused-pallas render/backward on the
REAL TPU against the XLA path at several shapes and report gradient/image
agreement. Interpret-mode tests (tests/) validate kernel LOGIC but cannot
catch Mosaic lowering bugs — this catches those (e.g. the compact pair-space
backward corrupting at T=256/K=512 while interpret-exact; see NOTES.md).

Run: python benchmarks/device_check.py   (one TPU process only)
Prints one JSON line per config; nonzero exit if any config exceeds
tolerance or crashes.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 5e-3  # worst-case relative gradient disagreement vs the XLA path


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def check(tag, n, W, Kk, scale, seed=3, cull=0.0):
    import jax
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render_params

    rng = np.random.default_rng(seed)
    xyz = (rng.normal(size=(n, 3)) * 0.8).astype(np.float32)
    xyz[:, 2] += 4.0
    model = init_from_points(xyz, np.full(n, scale, np.float32))
    sh = np.array(model.sh)
    sh[0:3, :n] = rng.uniform(0.5, 3, (n, 3)).T
    model = model._replace(sh=jnp.asarray(sh))
    H = W
    f = 1.2 * W
    P = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    K = jnp.asarray([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]])
    params = model.trainable()
    target = jnp.zeros((1, H, W, 3))
    mp = 16 * n

    def loss(p, cfg):
        im, _ = render_params(p, model.alive, P, K, (W, H), cfg)
        return jnp.mean((im - target) ** 2)

    cfg_x = RenderConfig(
        tile_size=16, max_per_tile=Kk, tile_chunk=8, max_pairs=mp,
        cull_alpha_min=cull,
    )
    cfg_r = RenderConfig(
        tile_size=16, max_per_tile=Kk, use_pallas=True, max_pairs=mp,
        cull_alpha_min=cull,
    )
    ok = True
    try:
        lx, gx = jax.jit(jax.value_and_grad(loss), static_argnums=1)(params, cfg_x)
        lr, gr = jax.jit(jax.value_and_grad(loss), static_argnums=1)(params, cfg_r)
        worst = 0.0
        for name in params:
            a, b = np.asarray(gx[name]), np.asarray(gr[name])
            rel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-12))
            worst = max(worst, rel)
        lrel = abs(float(lx) - float(lr)) / max(abs(float(lx)), 1e-12)
        ok = worst < TOL and lrel < 1e-4
        print(
            json.dumps(
                {
                    "config": tag, "loss_xla": round(float(lx), 6),
                    "loss_pallas": round(float(lr), 6),
                    "grad_worst_rel": float(f"{worst:.3e}"), "ok": bool(ok),
                }
            ),
            flush=True,
        )
    except Exception as e:  # crash = failure, report and continue
        print(json.dumps({"config": tag, "error": str(e)[:200], "ok": False}),
              flush=True)
        ok = False
    return ok


def main():
    import jax

    # persistent compile cache: repeat invocations (e.g. kernel-flag A/Bs)
    # replay prior Mosaic compiles instead of paying minutes each
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    log("devices:", jax.devices())
    configs = [
        ("n2k_w128_K256", 2000, 128, 256, 0.08, 3, 0.0),
        ("n8k_w128_K512_trunc", 8000, 128, 512, 0.08, 3, 0.0),
        ("n20k_w256_K512_trunc", 20000, 256, 512, 0.1, 3, 0.0),
        ("n50k_w256_K1024", 50000, 256, 1024, 0.03, 3, 0.0),
        # round-1 failure shapes of the pair-space backward (fixed round 2):
        # K=1024 at a tiny tile grid (T=64) hit a TPU INTERNAL error; the
        # truncation-heavy shapes corrupted ~15 gaussians
        ("n20k_w128_K1024_T64", 20000, 128, 1024, 0.05, 3, 0.0),
        # the bench default culls at 1/255 — cull used to orphan gradient
        # segments (key gaps, fixed structurally in ops/binning); both paths
        # share the binning cull so the comparison stays exact
        ("n8k_w128_K512_cull", 8000, 128, 512, 0.08, 3, 1 / 255),
        ("n50k_w256_K1024_cull", 50000, 256, 1024, 0.03, 3, 1 / 255),
        # round-4: the quality run's truncation adaptation doubles K to
        # 2048/4096 on dense scenes — the full-K backward blew the 64M
        # scoped-VMEM limit at K=4096 (73.9M of (K, P) temps); the blocked
        # backward bounds VMEM by 2 (K, P) buffers + (D, P) block temps.
        # Dense inits (small scale, many gaussians per tile) so the large-K
        # slots are actually occupied.
        ("n50k_w128_K2048_trunc", 50000, 128, 2048, 0.05, 3, 0.0),
        ("n100k_w128_K4096_cull", 100000, 128, 4096, 0.04, 3, 1 / 255),
    ]
    # optional substring filters: `device_check.py K512 K256` runs the
    # matching subset (Mosaic compiles cost minutes each on a tunneled TPU;
    # a cheap subset still catches lowering regressions after kernel edits)
    pats = sys.argv[1:]
    if pats:
        configs = [c for c in configs if any(p in c[0] for p in pats)]
        log(f"filtered to {[c[0] for c in configs]}")
    results = [
        check(tag, n, W, Kk, s, seed=seed, cull=cull)
        for tag, n, W, Kk, s, seed, cull in configs
    ]
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
