"""Morton reordering: locality, invariance, and trainer integration."""

import numpy as np
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
from simplegaussiansplat_tk71_tpu.adaptive.reorder import (
    apply_permutation,
    morton_codes,
    morton_permutation,
    morton_reorder,
)
from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
from simplegaussiansplat_tk71_tpu.render import RenderConfig, render


def _model(n=96, seed=0, capacity=None):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz[:, 2] += 4.0
    return init_from_points(
        xyz, np.full(n, 0.1, np.float32), capacity=capacity
    ), xyz


def test_morton_codes_are_spatially_local():
    # points on a line share high bits with their neighbours: mean adjacent-
    # pair distance in sorted order must beat random order by a wide margin
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, size=(2000, 3))
    order = np.argsort(morton_codes(pts))
    d_sorted = np.linalg.norm(np.diff(pts[order], axis=0), axis=1).mean()
    d_rand = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert d_sorted < 0.35 * d_rand


def test_dead_rows_sort_last_alive_set_preserved():
    model, _ = _model(n=50, capacity=64)
    stats = DensifyStats.zeros(64)
    perm = morton_permutation(np.asarray(model.mean), np.asarray(model.alive))
    alive = np.asarray(model.alive)[perm]
    assert alive[:50].all() and not alive[50:].any()
    m2, _ = apply_permutation(model, stats, perm)
    assert int(m2.num_alive()) == 50
    # the population is the same set of gaussians
    np.testing.assert_allclose(
        np.sort(np.asarray(m2.mean)[0, :50]),
        np.sort(np.asarray(model.mean)[0, np.asarray(model.alive)]),
    )


def test_render_is_invariant_under_reorder():
    model, _ = _model(n=80, capacity=128)
    stats = DensifyStats.zeros(128)
    P = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    K = jnp.asarray([[[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]]])
    cfg = RenderConfig(tile_size=16, max_per_tile=128, tile_chunk=4)
    img0, _ = render(model, P, K, (64, 48), cfg)
    m2, _ = morton_reorder(model, stats)
    img1, _ = render(m2, P, K, (64, 48), cfg)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1), atol=2e-5)


def test_trainer_densify_with_morton_reorder():
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.trainer import Trainer

    model, _ = _model(n=64, capacity=96)

    class _DS:
        img_wh = (32, 32)
        extent = 2.0

    cfg = TrainConfig(
        max_per_tile=64, max_pairs=4096, morton_reorder=True,
        densify_from_iter=1, densification_interval=2,
        opacity_reset_interval=0,
    )
    tr = Trainer(model, _DS(), cfg)
    P = np.eye(3, 4, dtype=np.float32)[None]
    K = np.array([[[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]]], np.float32)
    tgt = np.zeros((1, 32, 32, 3), np.float32)
    for _ in range(4):
        m = tr.run_step(P, K, tgt)
    assert np.isfinite(float(m["loss"]))
    assert tr.n_alive > 0
