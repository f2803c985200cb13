"""Blocked early-out Pallas kernels vs. the single-pass exact kernels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
    rasterize_tiles_pallas,
)

from test_rasterize import _random_scene
from test_rasterize_pallas import _bins


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _setup(seed, n=40, W=32, H=32, K=64):
    mean2d, conic, color, opacity, depth = _random_scene(n, W, H, seed=seed)
    ids, mask = _bins(n, (W // 16) * (H // 16), depth, K)
    args = (
        ids, mask, jnp.asarray(mean2d.T), jnp.asarray(conic.T),
        jnp.asarray(color.T), jnp.asarray(opacity),
    )
    return args, (W, H)


def test_v2_forward_exact_matches_v1():
    args, wh = _setup(31)
    ref = rasterize_tiles_pallas(*args, wh, tile_size=16)
    got = rasterize_tiles_pallas(
        *args, wh, tile_size=16, depth_block=16, t_eps=0.0
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_v2_forward_early_out_close():
    # high opacities -> saturation -> early-out engages but result ~equal
    args, wh = _setup(32)
    ids, mask, m2, con, col, op = args
    op = jnp.minimum(op * 3.0, 0.99)
    ref = rasterize_tiles_pallas(ids, mask, m2, con, col, op, wh, tile_size=16)
    got = rasterize_tiles_pallas(
        ids, mask, m2, con, col, op, wh, tile_size=16, depth_block=16,
        t_eps=1e-4,
    )
    assert float(jnp.abs(got - ref).max()) < 1e-3


def test_v2_backward_exact_matches_v1():
    args, wh = _setup(33)
    ids, mask, m2, con, col, op = args
    key = jnp.cos(jnp.arange(wh[0] * wh[1] * 3, dtype=jnp.float32)).reshape(
        wh[1], wh[0], 3
    )

    def loss(variant_kwargs, m2, con, col, op):
        img = rasterize_tiles_pallas(
            ids, mask, m2, con, col, op, wh, tile_size=16, **variant_kwargs
        )
        return jnp.sum(img * key)

    g1 = jax.grad(lambda *a: loss({}, *a), argnums=(0, 1, 2, 3))(m2, con, col, op)
    g2 = jax.grad(
        lambda *a: loss({"depth_block": 16, "t_eps": 0.0}, *a),
        argnums=(0, 1, 2, 3),
    )(m2, con, col, op)
    for a, b, name in zip(g1, g2, ["mean2d", "conic", "color", "opacity"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6, err_msg=name
        )
