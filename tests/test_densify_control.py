"""Round-3 densification-control overhaul (VERDICT round-2 next #1).

Covers: the official-3DGS screen-space 2-D statistic (batch-scaling
semantics), growth budgeting, screen-size pruning, Adam-moment preservation
across densify repacks, and the position-lr schedule staying on the global
step across optimizer re-inits.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from simplegaussiansplat_tk71_tpu.adaptive.densify import (
    DensifyStats,
    densify_and_prune,
)
from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
from simplegaussiansplat_tk71_tpu.train.trainer import (
    Trainer,
    remap_opt_state,
    set_schedule_counts,
)

from test_train import _synthetic_scene


def _trainer(cfg=None, **scene_kw):
    gt, scene, images = _synthetic_scene(**scene_kw)
    ds = SceneDataset(scene, images=images)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
    )
    cfg = cfg or TrainConfig(
        batch_size=2, densify_from_iter=10_000, opacity_reset_interval=0,
        tile_size=16, max_per_tile=64, tile_chunk=2,
    )
    return Trainer(model, ds, cfg, log_fn=lambda *a: None), ds


def _zero_lr_cfg(**kw):
    return TrainConfig(
        batch_size=2, densify_from_iter=10_000, opacity_reset_interval=0,
        tile_size=16, max_per_tile=64, tile_chunk=2,
        position_lr_init=1e-30, position_lr_final=1e-30, feature_lr=0.0,
        opacity_lr=0.0, scaling_lr=0.0, rotation_lr=0.0, **kw,
    )


def test_grad2d_batch_scaling_semantics():
    """Accumulating one batch-2 step must equal two single-camera steps
    (official 3DGS accumulates per render call; the B-scaling in
    make_train_step undoes the batch-mean)."""
    gt, scene, images = _synthetic_scene(seed=7)
    ds = SceneDataset(scene, images=images)

    def fresh():
        model = init_from_points(
            scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
        )
        return Trainer(model, ds, _zero_lr_cfg(), log_fn=lambda *a: None)

    P, K = scene.P, scene.K
    tr2 = fresh()
    tr2.run_step(P[:2], K[:2], images[:2])
    tr1 = fresh()
    tr1.run_step(P[:1], K[:1], images[:1])
    tr1.run_step(P[1:2], K[1:2], images[1:2])

    np.testing.assert_allclose(
        np.asarray(tr2.stats.grad2d_accum),
        np.asarray(tr1.stats.grad2d_accum),
        rtol=2e-4, atol=1e-10,
    )
    np.testing.assert_array_equal(
        np.asarray(tr2.stats.vis2d_count), np.asarray(tr1.stats.vis2d_count)
    )
    # per-camera counter >= any-camera counter
    assert (
        np.asarray(tr2.stats.vis2d_count).sum()
        >= np.asarray(tr2.stats.visible_count).sum()
    )
    # radius tracked for visible gaussians
    assert float(jnp.max(tr2.stats.max_radius2d)) > 0.0


def test_grad2d_nonzero_only_for_visible():
    tr, ds = _trainer()
    it = ds.batches(2, seed=1)
    P, K, imgs, _ = next(it)
    tr.run_step(P, K, imgs)
    g2 = np.asarray(tr.stats.grad2d_accum)
    vis = np.asarray(tr.stats.vis2d_count)
    assert np.all(g2[vis == 0] == 0.0)
    assert np.all(np.isfinite(g2))
    assert g2[vis > 0].max() > 0.0


def _model_with_stats(n=10, cap=16, scale=0.05):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    model = init_from_points(xyz, np.full(n, scale, np.float32), capacity=cap)
    return model


def test_growth_budget_top_score_wins():
    model = _model_with_stats(n=10, scale=0.05)
    # scores 10, 9, ..., 1 for the 10 alive rows (grad2d stat)
    scores = np.zeros(16, np.float32)
    scores[:10] = np.arange(10, 0, -1)
    stats = DensifyStats.zeros(16)._replace(
        grad2d_accum=jnp.asarray(scores), vis2d_count=jnp.ones(16, jnp.int32)
    )
    # all 10 are small -> clones (+1 each); budget caps at 3 added
    new, nstats, info = densify_and_prune(
        model, stats, extent=10.0, grad_threshold=0.5, prune_min_opacity=0.0,
        stat="grad2d", max_alive=13,
    )
    assert info["clone"] == 3 and info["growth_capped"] == 7
    assert info["alive"] == 13
    # the cloned rows are the 3 highest-score ones (rows 0-2): their clones
    # duplicate positions of rows 0..2
    mean = np.asarray(new.mean).T
    np.testing.assert_allclose(mean[10:13], mean[0:3], rtol=1e-6)


def test_growth_limit_multiplier():
    model = _model_with_stats(n=10, scale=0.05)
    stats = DensifyStats.zeros(16)._replace(
        grad2d_accum=jnp.full((16,), 10.0),
        vis2d_count=jnp.ones(16, jnp.int32),
    )
    new, _, info = densify_and_prune(
        model, stats, extent=10.0, grad_threshold=0.5, prune_min_opacity=0.0,
        stat="grad2d", growth_limit=1.2,
    )
    assert info["alive"] == 12  # 10 * 1.2


def test_screen_size_prune():
    model = _model_with_stats(n=10, scale=0.05)
    radius = np.zeros(16, np.float32)
    radius[3] = 50.0
    radius[7] = 5.0
    stats = DensifyStats.zeros(16)._replace(max_radius2d=jnp.asarray(radius))
    new, _, info = densify_and_prune(
        model, stats, extent=10.0, grad_threshold=1e9, prune_min_opacity=0.0,
        max_screen_size=20.0,
    )
    assert info["screen_prune"] == 1 and info["alive"] == 9
    # disabled when None
    _, _, info2 = densify_and_prune(
        model, stats, extent=10.0, grad_threshold=1e9, prune_min_opacity=0.0,
        max_screen_size=None,
    )
    assert info2["screen_prune"] == 0 and info2["alive"] == 10


def test_adam_src_and_remap():
    """Clone event: survivors keep moments, clones start at zero, counters
    carried."""
    from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer

    model = _model_with_stats(n=10, scale=0.05)
    cfg = TrainConfig()
    optimizer = make_optimizer(cfg)
    params = model.trainable()
    opt_state = optimizer.init(params)
    # fake some nonzero moments: one update with random grads
    grads = jax.tree.map(
        lambda p: jnp.asarray(
            np.random.default_rng(0).normal(size=p.shape), p.dtype
        ),
        params,
    )
    _, opt_state = optimizer.update(grads, opt_state, params)
    opt_state = set_schedule_counts(opt_state, 500)

    scores = np.zeros(16, np.float32)
    scores[2] = 10.0  # clone row 2 only
    stats = DensifyStats.zeros(16)._replace(
        grad2d_accum=jnp.asarray(scores), vis2d_count=jnp.ones(16, jnp.int32)
    )
    new_model, _, info = densify_and_prune(
        model, stats, extent=10.0, grad_threshold=0.5, prune_min_opacity=0.0,
        stat="grad2d",
    )
    src = info["adam_src"]
    assert info["clone"] == 1 and info["alive"] == 11
    np.testing.assert_array_equal(src[:10], np.arange(10))
    assert src[10] == -1  # the clone is a fresh row

    new_state = remap_opt_state(
        optimizer, opt_state, new_model.trainable(), src, cap_old=16
    )
    # every capacity-shaped leaf (Adam mu/nu per group): survivors carried,
    # the fresh clone row zeroed
    checked = 0
    for o, n_ in zip(jax.tree.leaves(opt_state), jax.tree.leaves(new_state)):
        o, n_ = np.asarray(o), np.asarray(n_)
        if o.ndim >= 1 and o.shape[-1] == 16:
            np.testing.assert_allclose(n_[..., :10], o[..., :10], rtol=1e-6)
            assert np.all(n_[..., 10] == 0.0)  # fresh clone row
            checked += 1
    assert checked >= 10  # mu+nu across the 5 parameter groups
    # schedule counters carried
    sched = [
        s.count for s in jax.tree.leaves(
            new_state,
            is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState),
        ) if isinstance(s, optax.ScaleByScheduleState)
    ]
    assert sched and all(int(c) == 500 for c in sched)


@pytest.mark.slow
def test_position_lr_tracks_global_step_across_densify():
    """Round-1/2 bug: _reinit_opt at densify events restarted the optax
    schedule count, freezing the position lr at lr_init forever."""
    cfg = TrainConfig(
        batch_size=2, densify_from_iter=2, densify_until_iter=100,
        densification_interval=3, opacity_reset_interval=4,
        grad2d_threshold=1e-9,  # force events
        tile_size=16, max_per_tile=64, tile_chunk=2,
    )
    gt, scene, images = _synthetic_scene(seed=3, gauss_scale=0.1, cam_spread=2.0)
    ds = SceneDataset(scene, images=images)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.1, np.float32), capacity=64
    )
    tr = Trainer(model, ds, cfg, log_fn=lambda *a: None)
    it = ds.batches(2, seed=1)
    for _ in range(7):
        P, K, imgs, _ = next(it)
        tr.run_step(P, K, imgs)
    assert len(tr.densify_events) >= 1
    counts = [
        int(s.count) for s in jax.tree.leaves(
            tr.opt_state,
            is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState),
        ) if isinstance(s, optax.ScaleByScheduleState)
    ]
    assert counts and all(c == tr.step for c in counts), (counts, tr.step)

    # same with the reference-parity full rebuild (fresh model: the first
    # trainer's donated step consumed the original buffers)
    model2 = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.1, np.float32), capacity=64
    )
    cfg2 = TrainConfig(**{**cfg.__dict__, "preserve_adam_on_densify": False})
    tr2 = Trainer(model2, ds, cfg2, log_fn=lambda *a: None)
    it = ds.batches(2, seed=1)
    for _ in range(7):
        P, K, imgs, _ = next(it)
        tr2.run_step(P, K, imgs)
    counts2 = [
        int(s.count) for s in jax.tree.leaves(
            tr2.opt_state,
            is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState),
        ) if isinstance(s, optax.ScaleByScheduleState)
    ]
    assert counts2 and all(c == tr2.step for c in counts2)


@pytest.mark.slow
def test_restore_legacy_checkpoint_without_new_stats(tmp_path):
    """Checkpoints from before the round-3 stats extension restore with the
    new stat fields zeroed."""
    import os

    tr, ds = _trainer()
    it = ds.batches(2, seed=1)
    for _ in range(2):
        P, K, imgs, _ = next(it)
        tr.run_step(P, K, imgs)
    from simplegaussiansplat_tk71_tpu.train.checkpoint import save_checkpoint

    path = os.path.join(tmp_path, "ckpt_2.npz")
    save_checkpoint(path, tr.model, tr.opt_state, tr.stats, tr.step)
    # strip the round-3 stat keys to emulate a legacy checkpoint
    data = dict(np.load(path))
    legacy = {
        k: v for k, v in data.items()
        if not any(
            k == f"stats.{f}"
            for f in ("grad2d_accum", "vis2d_count", "max_radius2d",
                      "truncated_accum")
        )
    }
    legacy_path = os.path.join(tmp_path, "legacy.npz")
    np.savez(legacy_path, **legacy)

    tr2, _ = _trainer()
    step = tr2.restore(legacy_path)
    assert step == 2
    assert float(jnp.sum(tr2.stats.grad2d_accum)) == 0.0
    np.testing.assert_array_equal(
        np.asarray(tr2.stats.grad_norm_accum),
        np.asarray(tr.stats.grad_norm_accum),
    )
    # and it keeps training
    P, K, imgs, _ = next(it)
    m = tr2.run_step(P, K, imgs)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_adaptive_max_per_tile_doubles_on_truncation():
    """Persistent per-tile truncation doubles K at the densify boundary
    (VERDICT round-2 weak #2: truncation was reported but never acted on)."""
    cfg = TrainConfig(
        batch_size=2, densify_from_iter=2, densify_until_iter=100,
        densification_interval=3, opacity_reset_interval=0,
        grad2d_threshold=1e9,  # no split/clone — isolate the adaptation
        tile_size=16, max_per_tile=4, tile_chunk=2,
        adapt_trunc_per_step=0.5, max_per_tile_limit=16,
    )
    gt, scene, images = _synthetic_scene(seed=3, gauss_scale=0.1, cam_spread=2.0)
    ds = SceneDataset(scene, images=images)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.1, np.float32), capacity=64
    )
    tr = Trainer(model, ds, cfg, log_fn=lambda *a: None)
    assert tr.render_cfg.max_per_tile == 4
    it = ds.batches(2, seed=1)
    for _ in range(4):  # covers the densify event at step 3
        P, K, imgs, _ = next(it)
        m = tr.run_step(P, K, imgs)
    assert int(jax.device_get(m["truncated"])) > 0  # K=4 really truncates
    assert tr.render_cfg.max_per_tile == 8  # doubled once at the event
    for _ in range(3):  # next event: doubles again (still truncating)
        P, K, imgs, _ = next(it)
        tr.run_step(P, K, imgs)
    assert tr.render_cfg.max_per_tile == 16
    # ceiling respected on later events
    for _ in range(3):
        P, K, imgs, _ = next(it)
        m = tr.run_step(P, K, imgs)
    assert tr.render_cfg.max_per_tile == 16
    assert np.isfinite(float(jax.device_get(m["loss"])))


def test_world_prune_gating():
    """Official 3DGS applies the world-size 0.1*extent prune only with the
    screen prune (post-first-opacity-reset); world_prune=False must keep a
    big-world gaussian that would otherwise be deleted. Regression for the
    CLI e2e scene, where extent=0.125 vs kNN init scales ~0.27 deleted the
    ENTIRE population at the first densify event."""
    model = _model_with_stats(n=10, scale=0.05)
    ls = np.asarray(model.log_scale).copy()
    ls[1, 4] = np.log(5.0)  # row 4: max scale 5 > 0.1 * extent(=10)
    model = model._replace(log_scale=jnp.asarray(ls))
    stats = DensifyStats.zeros(16)
    # default (direct call): reference behavior, unconditional world prune
    _, _, info = densify_and_prune(
        model, stats, extent=10.0, grad_threshold=1e9, prune_min_opacity=0.0,
    )
    assert info["alive"] == 9
    # gated off (trainer pre-reset): the big gaussian survives
    _, _, info2 = densify_and_prune(
        model, stats, extent=10.0, grad_threshold=1e9, prune_min_opacity=0.0,
        world_prune=False,
    )
    assert info2["alive"] == 10


def test_trainer_world_prune_gated_pre_reset():
    """Trainer-driven densify before the first opacity reset must not
    world-prune: a near-degenerate camera extent (all cameras close
    together) with normal kNN init scales keeps its population."""
    gt, scene, images = _synthetic_scene(seed=3)
    ds = SceneDataset(scene, images=images)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
    )
    cfg = TrainConfig(
        batch_size=2, densify_from_iter=1, densification_interval=2,
        densify_until_iter=100, opacity_reset_interval=3000,
        tile_size=16, max_per_tile=64, tile_chunk=2,
    )
    tr = Trainer(model, ds, cfg, log_fn=lambda *a: None)
    tr.extent = 0.125  # the e2e failure extent; 0.1*extent << init scales
    n0 = tr.n_alive
    for P, K, imgs, _ in ds.batches(2, seed=0):
        tr.run_step(P, K, imgs)
        if tr.step >= 4:
            break
    assert tr.n_alive > 0.5 * n0, (
        f"population collapsed {n0} -> {tr.n_alive} under pre-reset "
        "world prune"
    )
