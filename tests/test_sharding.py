import numpy as np
import jax
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
from simplegaussiansplat_tk71_tpu.parallel.mesh import make_mesh
from simplegaussiansplat_tk71_tpu.parallel.sharding import make_sharded_train_step
from simplegaussiansplat_tk71_tpu.render import RenderConfig
from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer
from simplegaussiansplat_tk71_tpu.train.trainer import make_train_step

from test_train import _synthetic_scene


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_sharded_step_matches_single_device():
    """DP over 4 virtual chips == single-device step on the same 4-camera batch."""
    gt, scene, images = _synthetic_scene(n_cams=4, seed=5)
    ds = SceneDataset(scene, images=images)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
    )
    cfg = TrainConfig(tile_size=16, max_per_tile=64, tile_chunk=2)
    rcfg = RenderConfig(tile_size=16, max_per_tile=64, tile_chunk=2)
    opt = make_optimizer(cfg)

    params = model.trainable()
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(model.capacity)
    P, K, imgs = scene.P, scene.K, images

    # single-device reference (the step donates params/opt_state/stats, so
    # give it copies and keep the originals for the sharded run)
    copy = lambda t: jax.tree.map(jnp.array, t)
    single = make_train_step(cfg, rcfg, ds.img_wh, opt)
    p1, o1, s1, m1 = single(
        copy(params), model.alive, copy(opt_state), copy(stats),
        jnp.asarray(P), jnp.asarray(K), jnp.asarray(imgs),
    )

    # 4-way sharded
    mesh = make_mesh(4)
    sharded = make_sharded_train_step(mesh, cfg, rcfg, ds.img_wh, opt)
    p4, o4, s4, m4 = sharded(
        params, model.alive, opt_state, stats,
        jnp.asarray(P), jnp.asarray(K), jnp.asarray(imgs),
    )

    np.testing.assert_allclose(
        float(m1["loss"]), float(m4["loss"]), rtol=1e-5, atol=1e-6
    )
    for name in params:
        np.testing.assert_allclose(
            np.asarray(p1[name]), np.asarray(p4[name]), rtol=1e-4, atol=1e-6,
            err_msg=name,
        )
    # visibility: sharded counts visible-on-any-chip, single counts any-camera
    np.testing.assert_array_equal(
        np.asarray(s1.visible_count), np.asarray(s4.visible_count)
    )
    np.testing.assert_allclose(
        np.asarray(s1.grad_norm_accum), np.asarray(s4.grad_norm_accum),
        rtol=1e-4, atol=1e-7,
    )


def test_sharded_step_eight_devices_runs():
    gt, scene, images = _synthetic_scene(n_cams=8, seed=6)
    ds = SceneDataset(scene, images=images)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
    )
    cfg = TrainConfig(tile_size=16, max_per_tile=64, tile_chunk=2)
    rcfg = RenderConfig(tile_size=16, max_per_tile=64, tile_chunk=2)
    opt = make_optimizer(cfg)
    mesh = make_mesh(8)
    step = make_sharded_train_step(mesh, cfg, rcfg, ds.img_wh, opt)
    params = model.trainable()
    p, o, s, m = step(
        params, model.alive, opt.init(params), DensifyStats.zeros(64),
        jnp.asarray(scene.P), jnp.asarray(scene.K), jnp.asarray(images),
    )
    assert np.isfinite(float(m["loss"]))
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(p))


def test_gauss_sharded_step_matches_single_device():
    """2-D (data=2, gauss=4) primitives+tiles sharding == single-device step."""
    from simplegaussiansplat_tk71_tpu.parallel.gauss_sharding import (
        make_2d_mesh,
        make_gauss_sharded_train_step,
    )

    gt, scene, images = _synthetic_scene(n_cams=2, seed=7)
    ds = SceneDataset(scene, images=images)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
    )
    cfg = TrainConfig(tile_size=16, max_per_tile=64, tile_chunk=2)
    rcfg = RenderConfig(
        tile_size=16, max_per_tile=64, tile_chunk=2, max_pairs=1024
    )
    opt = make_optimizer(cfg)

    params = model.trainable()
    opt_state = opt.init(params)
    stats = DensifyStats.zeros(model.capacity)

    copy = lambda t: jax.tree.map(jnp.array, t)
    single = make_train_step(cfg, rcfg, ds.img_wh, opt)
    p1, o1, s1, m1 = single(
        copy(params), model.alive, copy(opt_state), copy(stats),
        jnp.asarray(scene.P), jnp.asarray(scene.K), jnp.asarray(images),
    )

    mesh = make_2d_mesh(2, 4)
    sharded = make_gauss_sharded_train_step(
        mesh, cfg, rcfg, ds.img_wh, opt, params
    )
    p8, o8, s8, m8 = sharded(
        params, model.alive, opt_state, stats,
        jnp.asarray(scene.P), jnp.asarray(scene.K), jnp.asarray(images),
    )

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5, atol=1e-6
    )
    for name in params:
        np.testing.assert_allclose(
            np.asarray(p1[name]), np.asarray(p8[name]), rtol=1e-4,
            atol=1e-6, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(s1.grad_norm_accum), np.asarray(s8.grad_norm_accum),
        rtol=1e-4, atol=1e-7,
    )
