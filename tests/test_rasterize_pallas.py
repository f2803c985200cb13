"""Pallas kernel vs. the jnp reference path, in interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from simplegaussiansplat_tk71_tpu.ops import rasterize
from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
    rasterize_tiles_pallas,
)

from test_rasterize import _random_scene


def _bins(n, T, depth, max_per_tile):
    order = np.argsort(depth, kind="stable").astype(np.int32)
    K = max_per_tile
    ids = np.zeros((T, K), np.int32)
    mask = np.zeros((T, K), bool)
    ids[:, :n] = order[None, :]
    mask[:, :n] = True
    return jnp.asarray(ids), jnp.asarray(mask)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_pallas_forward_matches_jnp():
    W = H = 32
    n = 24
    mean2d, conic, color, opacity, depth = _random_scene(n, W, H, seed=11)
    ids, mask = _bins(n, 4, depth, 128)
    args = (
        ids, mask, jnp.asarray(mean2d.T), jnp.asarray(conic.T),
        jnp.asarray(color.T), jnp.asarray(opacity),
    )
    ref = rasterize.rasterize_tiles(*args, (W, H), tile_size=16, tile_chunk=4)
    got = rasterize_tiles_pallas(*args, (W, H), tile_size=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_pallas_backward_matches_jnp():
    W = H = 16
    n = 10
    mean2d, conic, color, opacity, depth = _random_scene(n, W, H, seed=13)
    ids, mask = _bins(n, 1, depth, 64)
    key = jnp.cos(jnp.arange(W * H * 3, dtype=jnp.float32)).reshape(H, W, 3)

    def loss_pallas(m2, con, col, op):
        img = rasterize_tiles_pallas(ids, mask, m2, con, col, op, (W, H), 16)
        return jnp.sum(img * key)

    def loss_ref(m2, con, col, op):
        img = rasterize.rasterize_tiles(
            ids, mask, m2, con, col, op, (W, H), tile_size=16, tile_chunk=1
        )
        return jnp.sum(img * key)

    args = (
        jnp.asarray(mean2d.T), jnp.asarray(conic.T), jnp.asarray(color.T),
        jnp.asarray(opacity),
    )
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(gp, gr, ["mean2d", "conic", "color", "opacity"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5, err_msg=name
        )


def test_pallas_masked_slots_zero_grads():
    W = H = 16
    n = 8
    mean2d, conic, color, opacity, depth = _random_scene(n, W, H, seed=17)
    # slot-mask half of them
    order = np.argsort(depth, kind="stable").astype(np.int32)
    ids = jnp.asarray(order[None])
    mask = jnp.asarray((np.arange(n) < 4)[None])

    def loss(op):
        img = rasterize_tiles_pallas(
            ids, mask, jnp.asarray(mean2d.T), jnp.asarray(conic.T),
            jnp.asarray(color.T), op, (W, H), 16
        )
        return jnp.sum(img)

    g = np.asarray(jax.grad(loss)(jnp.asarray(opacity)))
    masked_ids = np.asarray(ids[0])[4:]
    assert np.abs(g[masked_ids]).max() == 0.0
    kept_ids = np.asarray(ids[0])[:4]
    assert np.abs(g[kept_ids]).min() > 0.0


def test_pallas_odd_image_size_matches_jnp():
    W, H = 50, 34  # non-tile-aligned (real scenes: e.g. 640x427)
    n = 20
    mean2d, conic, color, opacity, depth = _random_scene(n, W, H, seed=19)
    ntx, nty = -(-W // 16), -(-H // 16)
    ids, mask = _bins(n, ntx * nty, depth, 64)
    args = (
        ids, mask, jnp.asarray(mean2d.T), jnp.asarray(conic.T),
        jnp.asarray(color.T), jnp.asarray(opacity),
    )
    ref = rasterize.rasterize_tiles(*args, (W, H), tile_size=16, tile_chunk=2)
    got = rasterize_tiles_pallas(*args, (W, H), tile_size=16)
    assert got.shape == (H, W, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)
