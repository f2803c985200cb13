import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from simplegaussiansplat_tk71_tpu.parallel.mesh import make_mesh
from simplegaussiansplat_tk71_tpu.parallel.tile_sharding import (
    make_tile_sharded_render,
    make_tile_sharded_train_step,
)
from simplegaussiansplat_tk71_tpu.render import RenderConfig, render
from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer

from test_render import _scene


def test_tile_sharded_render_matches_single_device():
    model, Pm, Km, wh, n = _scene(seed=21)
    cfg = RenderConfig(tile_size=16, max_per_tile=64, tile_chunk=2)
    ref, _ = render(model, Pm, Km, wh, cfg)

    mesh = make_mesh(4)
    render_fn = make_tile_sharded_render(mesh, wh, cfg)
    sharded = jax.jit(
        jax.shard_map(
            lambda p, a, P_, K_: render_fn(p, a, P_, K_),
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    got = sharded(model.trainable(), model.alive, Pm, Km)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_tile_sharded_render_pallas_matches_single_device():
    from jax.experimental.pallas import tpu as pltpu

    model, Pm, Km, wh, n = _scene(seed=21)
    cfg = RenderConfig(tile_size=16, max_per_tile=64, tile_chunk=2)
    ref, _ = render(model, Pm, Km, wh, cfg)

    mesh = make_mesh(4)
    pcfg = cfg._replace(use_pallas=True)
    render_fn = make_tile_sharded_render(mesh, wh, pcfg)
    sharded = jax.jit(
        jax.shard_map(
            lambda p, a, P_, K_: render_fn(p, a, P_, K_),
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    with pltpu.force_tpu_interpret_mode():
        got = sharded(model.trainable(), model.alive, Pm, Km)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


def test_tile_sharded_step_gradients_match():
    model, Pm, Km, wh, n = _scene(seed=22)
    cfg = TrainConfig(tile_size=16, max_per_tile=64, tile_chunk=2)
    rcfg = RenderConfig(tile_size=16, max_per_tile=64, tile_chunk=2)
    opt = make_optimizer(cfg)
    params = model.trainable()
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(model.capacity)
    rng = np.random.default_rng(0)
    target = jnp.asarray(
        rng.uniform(0, 1, (1, wh[1], wh[0], 3)).astype(np.float32)
    )

    # single-device reference step (same math, no sharding)
    from simplegaussiansplat_tk71_tpu.train.trainer import make_train_step

    single = make_train_step(cfg, rcfg, wh, opt)
    # the step donates params/opt_state/stats: hand it copies
    copy = lambda t: jax.tree.map(jnp.array, t)
    p1, _, _, m1 = single(
        copy(params), model.alive, copy(opt_state), copy(stats), Pm, Km, target
    )

    mesh = make_mesh(4)
    step = make_tile_sharded_train_step(mesh, cfg, rcfg, wh, opt)
    p4, _, _, m4 = step(params, model.alive, opt_state, stats, Pm, Km, target)

    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]), rtol=1e-5)
    for name in params:
        # atol 1e-5: Adam normalizes near-zero grads, amplifying f32
        # reassociation differences between the sharded/single lowerings
        np.testing.assert_allclose(
            np.asarray(p1[name]), np.asarray(p4[name]), rtol=1e-3, atol=1e-5,
            err_msg=name,
        )


def test_tile_sharded_binning_is_band_local():
    """Round-5 (VERDICT r4 next #7): the binning runs band-locally — the
    per-chip pair buffer shrinks with the device count, and the render with
    the shrunken buffer still matches single-device exactly."""
    model, Pm, Km, wh, n = _scene(seed=23)
    cfg = RenderConfig(
        tile_size=16, max_per_tile=64, tile_chunk=2, max_pairs=4096
    )
    ref, aux = render(model, Pm, Km, wh, cfg)

    mesh = make_mesh(4)
    render_fn = make_tile_sharded_render(mesh, wh, cfg)
    # factor 2.0 over a 4-way mesh: half the global capacity per chip
    assert render_fn.local_pairs == 2048 < cfg.max_pairs
    mesh8 = make_mesh(8)
    render_fn8 = make_tile_sharded_render(mesh8, wh, cfg)
    assert render_fn8.local_pairs < render_fn.local_pairs

    sharded = jax.jit(
        jax.shard_map(
            lambda p, a, P_, K_: render_fn(p, a, P_, K_),
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    got = sharded(model.trainable(), model.alive, Pm, Km)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_tile_sharded_step_surfaces_overflow():
    """Band overflow is psum'd into the DensifyStats accumulators (was: the
    tile path silently skipped truncation tracking)."""
    model, Pm, Km, wh, n = _scene(seed=24)
    cfg = TrainConfig(tile_size=16, max_per_tile=2, tile_chunk=2)
    rcfg = RenderConfig(tile_size=16, max_per_tile=2, tile_chunk=2)
    opt = make_optimizer(cfg)
    params = model.trainable()
    rng = np.random.default_rng(0)
    target = jnp.asarray(
        rng.uniform(0, 1, (1, wh[1], wh[0], 3)).astype(np.float32)
    )
    mesh = make_mesh(4)
    step = make_tile_sharded_train_step(mesh, cfg, rcfg, wh, opt)
    _, _, stats, _ = step(
        params, model.alive, opt.init(params),
        DensifyStats.zeros(model.capacity), Pm, Km, target,
    )
    # K=2 forces per-tile truncation somewhere in the scene
    assert int(stats.truncated_accum) > 0
