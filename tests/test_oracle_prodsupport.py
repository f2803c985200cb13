"""Production-support oracle (composite_oracle_tilesupport) vs production.

The prod-support oracle shares only the SUPPORT DEFINITION with the
production rasterizer (3-sigma capped boxes at tile granularity,
ops/binning.py:133-136 + ops/projection.py:234-264); projection and
compositing are independent float64 NumPy. Rendering the same model
through both must agree to f32-rounding scales — this is the renderer-bias
bound that makes oracle GT a fittable target (the r4 7-sigma GT was
unfittable at views where stacked far-tail mass painted a veil no
rect-based rasterizer reproduces; see composite_oracle_tilesupport's
docstring).
"""

import numpy as np
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.render import RenderConfig, render
from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points

from oracle import render_oracle


def _scene(n=800, seed=7):
    rng = np.random.default_rng(seed)
    xyz = (rng.normal(size=(n, 3)) * np.array([1.2, 0.8, 1.5])).astype(
        np.float32
    )
    xyz[:, 2] += 4.0
    # include a few very close gaussians (the class the 7-sigma GT tripped
    # on: z < 1 in front of the camera with big screen footprints)
    xyz[:5, 2] = np.linspace(0.4, 1.2, 5)
    model = init_from_points(
        xyz, rng.uniform(0.02, 0.08, n).astype(np.float32), opacity_init=0.8
    )
    sh = np.array(model.sh)
    sh[0:3, :n] = rng.uniform(0.2, 1.5, (n, 3)).T
    model = model._replace(sh=jnp.asarray(sh))
    return model


def test_prod_support_oracle_matches_production():
    W, H = 160, 112
    f = 140.0
    model = _scene()
    P = np.eye(3, 4, dtype=np.float32)[None]
    K = np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32)
    cfg = RenderConfig(
        max_per_tile=1024, max_pairs=600_000, tile_chunk=16,
        cull_alpha_min=0.0,
    )
    img, aux = render(model, jnp.asarray(P), jnp.asarray(K), (W, H), cfg)
    assert int(aux.truncated[0]) == 0 and int(aux.dropped_pairs[0]) == 0
    prod = np.clip(np.asarray(img[0]), 0, 1)

    alive = np.asarray(model.alive)
    nb = (model.sh_degree + 1) ** 2
    model_np = {
        "mean": np.asarray(model.mean).T[alive].astype(np.float64),
        "quat": np.asarray(model.quat).T[alive].astype(np.float64),
        "log_scale": np.asarray(model.log_scale).T[alive].astype(np.float64),
        "opacity": 1.0 / (1.0 + np.exp(
            -np.asarray(model.logit_opacity)[alive].astype(np.float64))),
        "sh": np.asarray(model.sh).T[alive].reshape(-1, nb, 3).astype(
            np.float64
        ),
    }
    orc = np.clip(
        render_oracle(
            model_np, P[0].astype(np.float64), K[0].astype(np.float64),
            W, H, support="prod", bbox_max_frac=cfg.bbox_max_frac,
            tile_size=cfg.tile_size,
        ),
        0, 1,
    )
    mse = float(np.mean((prod - orc) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # f32 production vs f64 oracle on identical support: rounding-scale
    # agreement. (The same scene rendered against a 7-sigma oracle window
    # disagrees at tail-mass scales instead.)
    assert psnr > 38.0, psnr

    sig = np.clip(
        render_oracle(
            model_np, P[0].astype(np.float64), K[0].astype(np.float64),
            W, H, window_sigma=7.0,
        ),
        0, 1,
    )
    mse_sig = float(np.mean((prod - sig) ** 2))
    psnr_sig = 10 * np.log10(1.0 / max(mse_sig, 1e-12))
    # sanity: support must matter on this scene (close-range gaussians) —
    # the 7-sigma window disagrees with production far more than the
    # prod-support oracle does
    assert psnr_sig < psnr - 3.0, (psnr_sig, psnr)
