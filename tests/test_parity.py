"""Reference-quirk parity modes.

The reference evaluates the Gauss kernel at INTEGER pixel coordinates of a
(H+1, W+1) canvas trimmed by [1:, 1:] (so final pixel (x, y) samples
coordinate (x+1, y+1) — gs_model.py:454,505,541) with pixel means truncated
to int32 (gs_model.py:361). pixel_offset=1.0 + snap_mean_to_int reproduce
that sampling; the oracle emulates the same quirks for the comparison.
"""

import numpy as np
import jax
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.ops import projection, rasterize

from oracle import composite_oracle, project_oracle


def test_reference_sampling_parity():
    rng = np.random.default_rng(0)
    n = 15
    W = H = 32
    mean = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    mean[:, 2] += 4.0
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    log_scale = (rng.normal(size=(n, 3)) * 0.2 - 1.3).astype(np.float32)
    logit_op = rng.uniform(-1, 1, size=(n,)).astype(np.float32)
    sh = np.zeros((27, n), np.float32)
    sh[0:3] = rng.uniform(0.5, 3.0, size=(n, 3)).T
    f = 40.0
    P = np.eye(3, 4, dtype=np.float32)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

    proj = projection.project(
        jnp.asarray(mean.T), jnp.asarray(quat.T), jnp.asarray(log_scale.T),
        jnp.asarray(logit_op), jnp.asarray(sh),
        jnp.asarray(P)[None], jnp.asarray(K)[None], (W, H),
        snap_mean_to_int=True,
    )
    n_tiles = (W // 16) * (H // 16)
    order = np.argsort(np.asarray(proj.depth[0]), kind="stable").astype(np.int32)
    ids = jnp.asarray(np.tile(order[None], (n_tiles, 1)))
    mask = jnp.ones((n_tiles, n), bool)
    img = rasterize.rasterize_tiles(
        ids, mask, proj.mean2d[0], proj.conic[0], proj.color[0],
        proj.opacity[0], (W, H), tile_size=16, pixel_offset=1.0,
    )

    # oracle with the same reference conventions
    pr = project_oracle(
        mean.astype(np.float64), quat.astype(np.float64),
        log_scale.astype(np.float64), P.astype(np.float64), K.astype(np.float64),
    )
    mean2d_snapped = np.trunc(pr["mean2d"])
    opac = 1 / (1 + np.exp(-logit_op.astype(np.float64)))
    color = np.asarray(proj.color[0], np.float64).T
    ref = composite_oracle(
        mean2d_snapped, pr["conic"], color, opac, pr["depth"], W, H,
        pixel_offset=1.0,
    )
    np.testing.assert_allclose(np.asarray(img), ref, rtol=1e-3, atol=1e-4)


def test_snap_blocks_position_gradient():
    """In parity mode, dL/dmean2d through the position path is zero
    (the reference's int cast severs autograd — gs_model.py:361)."""
    mean = jnp.asarray([[0.1], [-0.2], [4.0]])
    quat = jnp.asarray([[0.0], [0], [0], [1]])
    ls = jnp.full((3, 1), -1.0)
    lo = jnp.zeros((1,))
    sh = jnp.zeros((27, 1)).at[0:3].set(1.0)
    P = jnp.eye(3, 4)[None]
    K = jnp.asarray([[[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]]])

    def mean2d_sum(m, snap):
        pr = projection.project(
            m, quat, ls, lo, sh, P, K, (32, 32), snap_mean_to_int=snap
        )
        return jnp.sum(pr.mean2d)

    g_float = jax.grad(lambda m: mean2d_sum(m, False))(mean)
    g_snap = jax.grad(lambda m: mean2d_sum(m, True))(mean)
    assert float(jnp.abs(g_float).max()) > 0
    assert float(jnp.abs(g_snap).max()) == 0
