import numpy as np
import jax
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.ops import rasterize

from oracle import composite_oracle


def _random_scene(n, W, H, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    mean2d = rng.uniform(0, [W, H], size=(n, 2)).astype(np.float32)
    # random SPD conics with moderate extent
    L = rng.normal(size=(n, 2, 2)) * 0.3
    cov = L @ L.transpose(0, 2, 1) * spread + 2.0 * np.eye(2)
    inv = np.linalg.inv(cov)
    conic = np.stack([inv[:, 0, 0], inv[:, 0, 1], inv[:, 1, 1]], -1).astype(
        np.float32
    )
    color = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    opacity = rng.uniform(0.2, 0.9, size=(n,)).astype(np.float32)
    depth = rng.uniform(1, 10, size=(n,)).astype(np.float32)
    return mean2d, conic, color, opacity, depth


def _full_coverage_bins(n, W, H, tile_size, depth):
    """Every gaussian in every tile, depth sorted (to match the no-box oracle)."""
    T = (W // tile_size) * (H // tile_size)
    order = np.argsort(depth, kind="stable").astype(np.int32)
    ids = np.tile(order[None, :], (T, 1))
    mask = np.ones((T, n), bool)
    return jnp.asarray(ids), jnp.asarray(mask)


def test_forward_matches_oracle():
    W = H = 32
    n = 24
    mean2d, conic, color, opacity, depth = _random_scene(n, W, H)
    ids, mask = _full_coverage_bins(n, W, H, 16, depth)
    img = rasterize.rasterize_tiles(
        ids, mask, jnp.asarray(mean2d.T), jnp.asarray(conic.T),
        jnp.asarray(color.T), jnp.asarray(opacity), (W, H), tile_size=16,
        tile_chunk=2,
    )
    ref = composite_oracle(
        mean2d.astype(np.float64), conic.astype(np.float64),
        color.astype(np.float64), opacity.astype(np.float64), depth, W, H,
    )
    np.testing.assert_allclose(np.asarray(img), ref, rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff():
    """Analytic backward == JAX autodiff of the plain dense forward."""
    W = H = 16
    n = 12
    mean2d, conic, color, opacity, depth = _random_scene(n, W, H, seed=3)
    order = np.argsort(depth, kind="stable").astype(np.int32)
    T = 1
    ids = jnp.asarray(np.tile(order[None], (T, 1)))
    mask = jnp.ones((T, n), bool)
    pix = rasterize._tile_pixel_coords(jnp.asarray([[0, 0]]), 16, 0.5)

    args = (
        jnp.asarray(mean2d)[ids],
        jnp.asarray(conic)[ids],
        jnp.asarray(color)[ids],
        jnp.asarray(opacity)[ids],
        mask,
        pix,
    )

    def loss_custom(mu, con, col, op):
        out = rasterize._composite(False, mu, con, col, op, mask, pix)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_plain(mu, con, col, op):
        out, _ = rasterize._forward_dense(mu, con, col, op, mask, pix)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    g_custom = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(*args[:4])
    g_plain = jax.grad(loss_plain, argnums=(0, 1, 2, 3))(*args[:4])
    for gc, gp, name in zip(g_custom, g_plain, ["mu", "conic", "color", "op"]):
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(gp), rtol=2e-3, atol=2e-5, err_msg=name
        )


def test_custom_vjp_finite_differences():
    W = H = 16
    n = 6
    mean2d, conic, color, opacity, depth = _random_scene(n, W, H, seed=5)
    order = np.argsort(depth, kind="stable").astype(np.int32)
    ids = jnp.asarray(order[None])
    mask = jnp.ones((1, n), bool)
    pix = rasterize._tile_pixel_coords(jnp.asarray([[0, 0]]), 16, 0.5)

    def loss(op):
        out = rasterize._composite(
            False, jnp.asarray(mean2d)[ids], jnp.asarray(conic)[ids],
            jnp.asarray(color)[ids], op[ids], mask, pix,
        )
        return jnp.sum(out)

    op0 = jnp.asarray(opacity)
    g = np.asarray(jax.grad(loss)(op0))
    eps = 1e-3
    for i in range(n):
        e = np.zeros(n, np.float32)
        e[i] = eps
        fd = (loss(op0 + e) - loss(op0 - e)) / (2 * eps)
        np.testing.assert_allclose(g[i], float(fd), rtol=5e-2, atol=1e-4)


def test_masked_slots_do_not_contribute():
    W = H = 16
    n = 8
    mean2d, conic, color, opacity, depth = _random_scene(n, W, H, seed=7)
    order = np.argsort(depth, kind="stable").astype(np.int32)
    ids = jnp.asarray(order[None])
    mask_all = jnp.ones((1, n), bool)
    # mask out the last 3 gaussians vs. physically removing them
    mask_partial = jnp.asarray((np.arange(n) < n - 3)[None])
    img_masked = rasterize.rasterize_tiles(
        ids, mask_partial, jnp.asarray(mean2d.T), jnp.asarray(conic.T),
        jnp.asarray(color.T), jnp.asarray(opacity), (W, H), tile_size=16,
    )
    keep = order[: n - 3]
    ids2 = jnp.asarray(np.arange(n - 3, dtype=np.int32)[None])
    img_removed = rasterize.rasterize_tiles(
        ids2, jnp.ones((1, n - 3), bool), jnp.asarray(mean2d[keep].T),
        jnp.asarray(conic[keep].T), jnp.asarray(color[keep].T),
        jnp.asarray(opacity[keep]), (W, H), tile_size=16,
    )
    np.testing.assert_allclose(
        np.asarray(img_masked), np.asarray(img_removed), atol=1e-6
    )
