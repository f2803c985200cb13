"""Pair-space gradient routing vs. the XLA scatter-add path, end to end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from simplegaussiansplat_tk71_tpu.render import RenderConfig, render_params

from test_render import _scene


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_routed_grads_match_xla_path():
    model, P, K, wh, n = _scene(seed=41)
    params = model.trainable()
    target = jnp.zeros((1, wh[1], wh[0], 3))

    def loss(params, cfg):
        img, _ = render_params(params, model.alive, P, K, wh, cfg)
        return jnp.mean((img - target) ** 2)

    cfg_xla = RenderConfig(tile_size=16, max_per_tile=64, tile_chunk=4)
    cfg_routed = RenderConfig(
        tile_size=16, max_per_tile=64, use_pallas=True, pair_grad_route=True
    )
    cfg_scatter = RenderConfig(
        tile_size=16, max_per_tile=64, use_pallas=True, pair_grad_route=False
    )
    l_x, g_x = jax.value_and_grad(loss)(params, cfg_xla)
    l_r, g_r = jax.value_and_grad(loss)(params, cfg_routed)
    l_s, g_s = jax.value_and_grad(loss)(params, cfg_scatter)
    np.testing.assert_allclose(float(l_x), float(l_r), rtol=1e-5)
    np.testing.assert_allclose(float(l_x), float(l_s), rtol=1e-5)
    for name in params:
        np.testing.assert_allclose(
            np.asarray(g_r[name]), np.asarray(g_x[name]),
            rtol=2e-3, atol=1e-6, err_msg=f"routed {name}",
        )
        np.testing.assert_allclose(
            np.asarray(g_s[name]), np.asarray(g_x[name]),
            rtol=2e-3, atol=1e-6, err_msg=f"scatter {name}",
        )


def test_routed_grads_with_blocked_kernel():
    model, P, K, wh, n = _scene(seed=43)
    params = model.trainable()
    target = jnp.zeros((1, wh[1], wh[0], 3))

    def loss(params, cfg):
        img, _ = render_params(params, model.alive, P, K, wh, cfg)
        return jnp.mean((img - target) ** 2)

    cfg_ref = RenderConfig(tile_size=16, max_per_tile=64, tile_chunk=4)
    cfg_v2 = RenderConfig(
        tile_size=16, max_per_tile=64, use_pallas=True, depth_block=16,
        t_eps=0.0, pair_grad_route=True,
    )
    g_ref = jax.grad(loss)(params, cfg_ref)
    g_v2 = jax.grad(loss)(params, cfg_v2)
    for name in params:
        np.testing.assert_allclose(
            np.asarray(g_v2[name]), np.asarray(g_ref[name]),
            rtol=2e-3, atol=1e-6, err_msg=name,
        )


def test_routed_grads_with_truncation_cond():
    """Per-tile truncation (tiny max_per_tile) flips the routing backward to
    its dummy-augmented branch (the lax.cond in _composite_pairroute_bwd);
    grads must still match the XLA path, which truncates identically."""
    model, P, K, wh, n = _scene(seed=47)
    params = model.trainable()
    target = jnp.zeros((1, wh[1], wh[0], 3))

    def loss(params, cfg):
        img, _ = render_params(params, model.alive, P, K, wh, cfg)
        return jnp.mean((img - target) ** 2)

    for kmax in (8, 256):  # 8 forces truncation; 256 exercises the lean path
        cfg_xla = RenderConfig(tile_size=16, max_per_tile=kmax, tile_chunk=4)
        cfg_routed = RenderConfig(
            tile_size=16, max_per_tile=kmax, use_pallas=True,
            pair_grad_route=True,
        )
        g_x = jax.grad(loss)(params, cfg_xla)
        g_r = jax.grad(loss)(params, cfg_routed)
        for name in params:
            np.testing.assert_allclose(
                np.asarray(g_r[name]), np.asarray(g_x[name]),
                rtol=2e-3, atol=1e-6, err_msg=f"K={kmax} {name}",
            )
