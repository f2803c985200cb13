"""Windowed fast oracle == unwindowed oracle (float64 GT generation path).

The windowed composite powers oracle ground-truth rendering at O(100k)
gaussians (quality_run --gt oracle); each excluded term is below
exp(-window_sigma^2/2), so the two oracles must agree to far below any
training-relevant tolerance.
"""

import numpy as np

from oracle import render_oracle


def _random_model(n, rng, spread=4.0):
    mean = rng.normal(0, spread, (n, 3))
    mean[:, 2] += 10.0
    quat = rng.normal(0, 1, (n, 4))
    log_scale = rng.uniform(-2.5, -0.5, (n, 3))
    opacity = rng.uniform(0.05, 0.95, n)
    sh = rng.normal(0, 0.3, (n, 9, 3))
    sh[:, 0] = rng.uniform(0.2, 3.0, (n, 3))
    return {
        "mean": mean, "quat": quat, "log_scale": log_scale,
        "opacity": opacity, "sh": sh,
    }


def test_windowed_oracle_matches_exact():
    rng = np.random.default_rng(7)
    model = _random_model(400, rng)
    P = np.eye(3, 4)
    K = np.array([[60.0, 0, 48.0], [0, 60.0, 32.0], [0, 0, 1.0]])
    W, H = 96, 64
    exact = render_oracle(model, P, K, W, H)
    fast = render_oracle(model, P, K, W, H, window_sigma=7.0, block=32)
    err = np.abs(exact - fast).max()
    # each excluded term < exp(-24.5) ~= 2.3e-11; with N=400 terms the
    # accumulated error stays far below f32 resolution
    assert err < 1e-7, f"windowed oracle deviates: max abs err {err:.3e}"


def test_windowed_oracle_nonpsd_fallback():
    # a conic with det <= 0 must fall back to the full-image window and
    # still agree with the dense composite (which has no window logic)
    rng = np.random.default_rng(3)
    model = _random_model(50, rng)
    # one degenerate gaussian: huge anisotropic scale -> near-singular conic
    model["log_scale"][0] = [6.0, -8.0, 0.0]
    P = np.eye(3, 4)
    K = np.array([[40.0, 0, 24.0], [0, 40.0, 16.0], [0, 0, 1.0]])
    W, H = 48, 32
    exact = render_oracle(model, P, K, W, H)
    fast = render_oracle(model, P, K, W, H, window_sigma=7.0, block=16)
    assert np.abs(exact - fast).max() < 1e-7
