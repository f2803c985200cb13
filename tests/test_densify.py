import numpy as np
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.adaptive.densify import (
    DensifyStats,
    densify_and_prune,
    reset_opacity,
)
from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points


def _model(n=10, cap=16, scale=0.05):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    return init_from_points(xyz, np.full(n, scale, np.float32), capacity=cap)


def test_clone_small_high_grad():
    model = _model(scale=0.05)  # small: max(scale) <= 0.01 * extent(=10)
    stats = DensifyStats(
        grad_norm_accum=jnp.where(jnp.arange(16) < 3, 1.0, 0.0),
        visible_count=jnp.ones(16, jnp.int32),
    )
    new, nstats, info = densify_and_prune(
        model, stats, extent=10.0, grad_threshold=0.5, prune_min_opacity=0.0
    )
    assert info["clone"] == 3 and info["split"] == 0 and info["prune"] == 0
    assert info["alive"] == 13


def test_split_large_high_grad():
    model = _model(scale=0.5)  # max(scale)=0.5 > 0.01 * 10
    stats = DensifyStats(
        grad_norm_accum=jnp.where(jnp.arange(16) < 2, 1.0, 0.0),
        visible_count=jnp.ones(16, jnp.int32),
    )
    new, nstats, info = densify_and_prune(
        model, stats, extent=10.0, grad_threshold=0.5, prune_min_opacity=0.0
    )
    # 2 split into 2 children each: originals removed -> 10 - 2 + 4 = 12
    assert info["split"] == 2 and info["alive"] == 12
    # children (last 4 alive rows) scale = log(scale / (0.8 * 2))
    ls = np.asarray(new.log_scale).T[np.asarray(new.alive)]
    np.testing.assert_allclose(np.exp(ls[-4:]), 0.5 / 1.6, rtol=1e-4)
    np.testing.assert_allclose(np.exp(ls[:8]), 0.5, rtol=1e-4)


def test_prune_transparent_and_huge():
    model = _model(scale=0.05)
    lo = np.array(model.logit_opacity)
    lo[0] = -10.0  # sigmoid ~ 4.5e-5 < 0.005
    ls = np.array(model.log_scale)
    ls[:, 1] = np.log(5.0)  # > 0.1 * extent(=10) -> pruned
    model = model._replace(
        logit_opacity=jnp.asarray(lo), log_scale=jnp.asarray(ls)
    )
    stats = DensifyStats.zeros(16)
    new, _, info = densify_and_prune(model, stats, extent=10.0)
    assert info["prune"] == 2 and info["alive"] == 8


def test_capacity_growth():
    model = _model(n=10, cap=16, scale=0.05)
    stats = DensifyStats(
        grad_norm_accum=jnp.where(jnp.arange(16) < 10, 1.0, 0.0),
        visible_count=jnp.ones(16, jnp.int32),
    )
    # clone all 10 repeatedly via low threshold: one round -> 20 > 16 capacity
    new, nstats, info = densify_and_prune(
        model, stats, extent=10.0, grad_threshold=0.5, prune_min_opacity=0.0
    )
    assert info["alive"] == 20
    assert new.capacity >= 20
    assert new.capacity % 4096 == 0
    assert nstats.grad_norm_accum.shape[0] == new.capacity


def test_reset_opacity():
    model = _model()
    new = reset_opacity(model, 0.01)
    sig = 1 / (1 + np.exp(-np.asarray(new.logit_opacity)))
    assert np.all(sig <= 0.01 + 1e-6)
    # idempotent on already-low opacities
    again = reset_opacity(new, 0.01)
    np.testing.assert_allclose(
        np.asarray(again.logit_opacity), np.asarray(new.logit_opacity), atol=1e-5
    )
