"""Non-PSD conic guard: garbage fragments composite as invisible, not NaN.

The f32 closed-form 2x2 inverse in ops/projection.py (``det = s00*s11 -
s01^2 + 1e-6``, parity with the reference uitility.py:431-463) cancels
catastrophically for huge anisotropic 2-D covariances and can flip the
conic's sign. An unguarded composite then evaluates exp(+big) = inf and
``t_excl * alpha`` = 0 * inf = NaN: the r3b quality run lost ~8% of its
train steps to the NaN-skip guard before the gate landed. Official 3DGS
skips these fragments (forward.cu ``if (power > 0.0f) continue``); the
reference crashes and restarts training instead (gs_control.py:241-244).

These tests inject a non-PSD conic directly and assert both composite paths
(XLA custom-vjp and the Pallas kernels in interpreter mode) render the same
image as if the garbage gaussian did not exist, with finite gradients
everywhere and exactly zero gradient for the garbage gaussian.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from simplegaussiansplat_tk71_tpu.ops import rasterize
from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
    rasterize_tiles_pallas,
)

from test_rasterize import _random_scene


def _scene_with_garbage(W, H, n, seed=5):
    """n-1 well-conditioned gaussians + one whose conic is negative-definite
    (q < 0 at every pixel center: mean is off every half-integer center)."""
    mean2d, conic, color, opacity, depth = _random_scene(n, W, H, seed=seed)
    bad = n - 1
    mean2d[bad] = [W * 0.43 + 0.17, H * 0.31 + 0.23]
    conic[bad] = [-0.5, 0.0, -0.5]  # negative definite -> q < 0 off-center
    opacity[bad] = 0.9
    color[bad] = [1.0, 0.5, 0.25]
    # garbage fragment composites FIRST in depth so, ungated, its inf alpha
    # would poison every later fragment's transmittance
    depth[bad] = 0.1
    return mean2d, conic, color, opacity, depth, bad


def _bins_full(n, T, depth, K):
    order = np.argsort(depth, kind="stable").astype(np.int32)
    ids = np.zeros((T, K), np.int32)
    mask = np.zeros((T, K), bool)
    ids[:, :n] = order[None, :]
    mask[:, :n] = True
    return jnp.asarray(ids), jnp.asarray(mask)


def _loss_and_grads(fn, mean2d, conic, color, opacity):
    args = (
        jnp.asarray(mean2d.T), jnp.asarray(conic.T), jnp.asarray(color.T),
        jnp.asarray(opacity),
    )
    img = fn(*args)
    grads = jax.grad(
        lambda *a: jnp.sum(jnp.sin(fn(*a))), argnums=(0, 1, 2, 3)
    )(*args)
    return np.asarray(img), [np.asarray(g) for g in grads]


def _check_path(fn, W, H, n):
    mean2d, conic, color, opacity, depth, bad = _scene_with_garbage(W, H, n)
    img, grads = _loss_and_grads(fn, mean2d, conic, color, opacity)

    # 1. no NaN/inf anywhere
    assert np.isfinite(img).all()
    for g in grads:
        assert np.isfinite(g).all(), "non-finite gradient"

    # 2. image identical to the scene without the garbage gaussian
    op_without = opacity.copy()
    op_without[bad] = 0.0
    img_without, _ = _loss_and_grads(fn, mean2d, conic, color, op_without)
    np.testing.assert_allclose(img, img_without, rtol=1e-6, atol=1e-7)

    # 3. the garbage gaussian receives exactly zero gradient
    g_mean, g_con, g_col, g_op = grads
    assert np.all(g_mean[:, bad] == 0.0)
    assert np.all(g_con[:, bad] == 0.0)
    assert np.all(g_col[:, bad] == 0.0)
    assert g_op[bad] == 0.0
    # ...and the healthy gaussians still receive some
    assert np.any(g_op != 0.0)


def test_nonpsd_conic_xla_path():
    W = H = 32
    n = 12
    _, _, _, _, depth, _ = _scene_with_garbage(W, H, n)
    ids, mask = _bins_full(n, 4, depth, n)

    def fn(m2, con, col, op):
        return rasterize.rasterize_tiles(
            ids, mask, m2, con, col, op, (W, H), tile_size=16, tile_chunk=4
        )

    _check_path(fn, W, H, n)


def test_nonpsd_conic_pallas_path():
    W = H = 32
    n = 12
    _, _, _, _, depth, _ = _scene_with_garbage(W, H, n)
    ids, mask = _bins_full(n, 4, depth, 128)

    def fn(m2, con, col, op):
        return rasterize_tiles_pallas(
            ids, mask, m2, con, col, op, (W, H), 16
        )

    with pltpu.force_tpu_interpret_mode():
        _check_path(fn, W, H, n)
