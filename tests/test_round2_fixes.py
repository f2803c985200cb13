"""Tests for the round-2 parity/robustness items (VERDICT.md #8):

- grad_color_wl parity switch (reference gs_model.py:762-766 grad_l = w/l)
- reference-format checkpoint export (gs_control.py:226-231 round-trip)
- Trainer.restore optimizer-mismatch handling (no silent degradation)
- two-way CLI bool flags (BooleanOptionalAction)
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplegaussiansplat_tk71_tpu.ops import rasterize


def _tile_scene(n=6, seed=11):
    rng = np.random.default_rng(seed)
    mu = rng.uniform(2, 14, (1, n, 2)).astype(np.float32)
    con = np.stack(
        [
            rng.uniform(0.05, 0.3, (1, n)),
            np.zeros((1, n)),
            rng.uniform(0.05, 0.3, (1, n)),
        ],
        axis=-1,
    ).astype(np.float32)
    col = rng.uniform(0.1, 2.0, (1, n, 3)).astype(np.float32)
    op = rng.uniform(0.2, 0.9, (1, n)).astype(np.float32)
    mask = jnp.ones((1, n), bool)
    pix = rasterize._tile_pixel_coords(jnp.asarray([[0, 0]]), 16, 0.5)
    return jnp.asarray(mu), jnp.asarray(con), jnp.asarray(col), jnp.asarray(op), mask, pix


def test_grad_color_wl_matches_reference_formula():
    """grad_color_wl=True must reproduce grad_l = w / l (gs_model.py:762-766):
    per-fragment channel-summed pixel grad divided by the color, contributions
    dropped where any color channel is zero."""
    mu, con, col, op, mask, pix = _tile_scene()
    # make one gaussian have a zero channel -> its color grad must vanish
    col = col.at[0, 2, 1].set(0.0)
    g_img = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, pix.shape[1], 3)).astype(np.float32)
    )

    def loss(c, wl):
        out = rasterize._composite(wl, mu, con, c, op, mask, pix)
        return jnp.sum(out * g_img)

    g_wl = jax.grad(loss)(col, True)
    g_spec = jax.grad(loss)(col, False)

    # oracle: w_k(p) = <dL/dI(p), T_k(p) alpha_k(p) col_k>; grad_l = sum_p w_k / col_k
    _, (dx, dy, g, alpha, anti, t_excl, w) = rasterize._forward_dense(
        mu, con, col, op, mask, pix
    )
    wk = np.einsum("tkp,tkc,tpc->tk", np.asarray(w), np.asarray(col), np.asarray(g_img))
    col_np = np.asarray(col)
    expect = wk[..., None] / np.where(col_np == 0, 1.0, col_np)
    expect = np.where(np.all(col_np != 0, axis=-1, keepdims=True), expect, 0.0)
    np.testing.assert_allclose(np.asarray(g_wl), expect, rtol=1e-4, atol=1e-6)

    # it is a genuinely different formula from the spec-correct one...
    assert float(jnp.max(jnp.abs(g_wl - g_spec))) > 1e-3
    # ...and the zero-channel gaussian gets exactly zero color grad
    assert np.all(np.asarray(g_wl)[0, 2] == 0.0)

    # every non-color grad is unaffected by the switch
    for i in (0, 1, 3):  # mu, con, op
        a = jax.grad(lambda *xs: loss_args(True, *xs), argnums=i)(mu, con, col, op)
        b = jax.grad(lambda *xs: loss_args(False, *xs), argnums=i)(mu, con, col, op)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def loss_args(wl, mu, con, col, op):
    pix = rasterize._tile_pixel_coords(jnp.asarray([[0, 0]]), 16, 0.5)
    mask = jnp.ones(op.shape, bool)
    out = rasterize._composite(wl, mu, con, col, op, mask, pix)
    return jnp.sum(out * jnp.cos(jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)))


def test_render_config_rejects_wl_with_pallas():
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render_params

    xyz = np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32)
    xyz[:, 2] += 4
    model = init_from_points(xyz, np.full(8, 0.2, np.float32))
    P = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    K = jnp.asarray([[[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]]])
    with pytest.raises(ValueError):
        render_params(
            model.trainable(), model.alive, P, K, (32, 32),
            RenderConfig(grad_color_wl=True, use_pallas=True),
        )


def test_save_reference_pt_roundtrip(tmp_path):
    """Export in the reference's five-tensor torch.save format
    (gs_control.py:226-231) and read it back with load_reference_pt."""
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.train.checkpoint import (
        load_reference_pt,
        save_reference_pt,
    )

    rng = np.random.default_rng(5)
    n = 37
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    model = init_from_points(xyz, rng.uniform(0.1, 1, n).astype(np.float32),
                             capacity=64)
    sh = np.array(model.sh)
    sh[:, :n] = rng.normal(size=(27, n)).astype(np.float32)
    model = model._replace(sh=jnp.asarray(sh))

    save_reference_pt(str(tmp_path), model)
    # the five files the reference writes
    for name in ("mean.pt", "variance_q.pt", "variance_scale.pt",
                 "opacity.pt", "color.pt"):
        assert (tmp_path / name).exists(), name
    # torch sees the reference shapes
    import torch

    op = torch.load(tmp_path / "opacity.pt", weights_only=True)
    assert tuple(op.shape) == (n, 1)
    col = torch.load(tmp_path / "color.pt", weights_only=True)
    assert tuple(col.shape) == (n, 9, 3)

    back = load_reference_pt(str(tmp_path))
    alive = np.asarray(model.alive)
    for field in ("mean", "quat", "log_scale", "logit_opacity", "sh"):
        a = np.asarray(getattr(model, field))[..., alive]
        b = np.asarray(getattr(back, field))[..., np.asarray(back.alive)]
        np.testing.assert_array_equal(a, b, err_msg=field)


def test_restore_reinitializes_only_on_structural_mismatch(tmp_path):
    """A checkpoint stripped of an optimizer key reinitializes Adam with a
    logged reason; an intact checkpoint must NOT log a mismatch."""
    from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.train.checkpoint import save_checkpoint
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.trainer import Trainer
    from test_train import _synthetic_scene

    gt, scene, images = _synthetic_scene(seed=8)
    ds = SceneDataset(scene, images=images)
    cfg = TrainConfig(batch_size=2, densify_from_iter=10_000,
                      opacity_reset_interval=0, tile_size=16,
                      max_per_tile=64, tile_chunk=2)

    logs = []

    def make():
        model = init_from_points(
            scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
        )
        return Trainer(model, ds, cfg, log_fn=lambda *a: logs.append(" ".join(map(str, a))))

    tr = make()
    it = ds.batches(2, seed=1)
    P, K, imgs, _ = next(it)
    tr.run_step(P, K, imgs)
    path = str(tmp_path / "ckpt_1.npz")
    save_checkpoint(path, tr.model, tr.opt_state, tr.stats, tr.step)

    # intact restore: no mismatch log, optimizer state == saved
    logs.clear()
    tr2 = make()
    assert tr2.restore(path) == 1
    assert not any("mismatch" in l for l in logs), logs
    for a, b in zip(jax.tree.leaves(tr.opt_state), jax.tree.leaves(tr2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # strip one optimizer key -> reinit + log
    data = dict(np.load(path))
    opt_keys = [k for k in data if k.startswith("opt")]
    assert opt_keys
    del data[opt_keys[0]]
    broken = str(tmp_path / "ckpt_2.npz")
    np.savez(broken, **data)
    logs.clear()
    tr3 = make()
    tr3.restore(broken)
    assert any("mismatch" in l for l in logs), logs
    # model params still restored
    np.testing.assert_array_equal(np.asarray(tr.model.mean), np.asarray(tr3.model.mean))


def test_cli_bool_flags_two_way():
    """--pair-grad-route / --no-pair-grad-route both parse; default stays None
    (= TrainConfig default). store_true could never disable a default-True."""
    from simplegaussiansplat_tk71_tpu.cli import _add_config_flags, _config_from_args

    p = argparse.ArgumentParser()
    _add_config_flags(p)

    args = p.parse_args([])
    assert getattr(args, "pair_grad_route") is None
    assert _config_from_args(args).pair_grad_route is True  # dataclass default

    args = p.parse_args(["--no-pair-grad-route"])
    assert _config_from_args(args).pair_grad_route is False

    args = p.parse_args(["--pair-grad-route"])
    assert _config_from_args(args).pair_grad_route is True

    # Optional[int] fields (use_pallas is Optional[bool], depth_block Optional[int])
    args = p.parse_args(["--depth-block", "256", "--cull-alpha-min", "0.004"])
    cfg = _config_from_args(args)
    assert cfg.depth_block == 256
    assert abs(cfg.cull_alpha_min - 0.004) < 1e-9


def _mixed_size_scene(seed=0):
    """Two camera sizes in one scene (reference handles per-image wh,
    gs_load_colmap.py:114-115): GT rendered per camera at its own size."""
    from simplegaussiansplat_tk71_tpu.data.colmap import ColmapScene
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render

    rng = np.random.default_rng(seed)
    n = 30
    xyz = (rng.normal(size=(n, 3)) * 0.6).astype(np.float32)
    xyz[:, 2] += 4.0
    gt = init_from_points(xyz, np.full(n, 0.25, np.float32), capacity=64)
    sh = np.array(gt.sh)
    sh[0:3, :n] = rng.uniform(0.5, 3.0, size=(n, 3)).T
    gt = gt._replace(sh=jnp.asarray(sh))

    sizes = [(48, 32), (32, 32), (48, 32), (32, 32)]
    f = 55.0
    Ps, Ks, images = [], [], []
    rcfg = RenderConfig(tile_size=16, max_per_tile=64, tile_chunk=2)
    for i, (W, H) in enumerate(sizes):
        ang = 0.12 * (i - 2)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = np.array([0.8 * (i - 2), 0, 0], np.float32)
        P = np.concatenate([R, t[:, None]], 1)
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
        img, _ = render(gt, jnp.asarray(P[None]), jnp.asarray(K[None]), (W, H), rcfg)
        Ps.append(P)
        Ks.append(K)
        images.append(np.asarray(img[0]))
    scene = ColmapScene(
        xyz=xyz, rgb=np.zeros((n, 3), np.uint8),
        P=np.stack(Ps), K=np.stack(Ks),
        wh=np.asarray(sizes, np.int32),
        image_names=[f"cam{i}" for i in range(4)],
    )
    return gt, scene, images


def test_mixed_camera_sizes_dataset_and_mask():
    from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset

    gt, scene, images = _mixed_size_scene()
    ds = SceneDataset(scene, images=images)
    assert ds.mixed_sizes
    assert ds.img_wh == (48, 32)
    batch = ds.get_images([0, 1])
    assert batch.shape == (2, 32, 48, 3)
    # cam 1 is 32 wide: its pad columns are zero, its mask matches
    assert np.all(batch[1, :, 32:] == 0)
    mask = ds.pixel_mask([0, 1])
    assert mask.shape == (2, 32, 48)
    assert mask[0].all()
    assert mask[1, :, :32].all() and not mask[1, :, 32:].any()


def test_mixed_camera_sizes_masked_loss_matches_per_camera_l1():
    from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
    from simplegaussiansplat_tk71_tpu.train.loss import photometric_loss

    gt, scene, images = _mixed_size_scene(seed=2)
    ds = SceneDataset(scene, images=images)
    pred = jnp.asarray(ds.get_images([0, 1]))
    rng = np.random.default_rng(1)
    target_list = [
        np.clip(im + rng.normal(0, 0.05, im.shape), 0, 1).astype(np.float32)
        for im in images[:2]
    ]
    W, H = ds.img_wh
    target = np.zeros((2, H, W, 3), np.float32)
    for r, im in enumerate(target_list):
        target[r, : im.shape[0], : im.shape[1]] = im
    mask = ds.pixel_mask([0, 1])
    loss, (l1, dssim) = photometric_loss(pred, jnp.asarray(target), mask=jnp.asarray(mask))
    # masked L1 == pixel-count-weighted mean of the per-camera (unpadded) L1s
    l1s, ns = [], []
    for im, tg in zip(images[:2], target_list):
        l1s.append(np.abs(im - tg).sum())
        ns.append(im.size)
    np.testing.assert_allclose(float(l1), sum(l1s) / sum(ns), rtol=1e-5)
    assert np.isfinite(float(loss)) and 0 <= float(dssim) <= 1


def test_mixed_camera_sizes_training_reduces_loss():
    from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.trainer import Trainer

    gt, scene, images = _mixed_size_scene(seed=3)
    ds = SceneDataset(scene, images=images)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
    )
    cfg = TrainConfig(
        batch_size=2, densify_from_iter=10_000, opacity_reset_interval=0,
        tile_size=16, max_per_tile=64, tile_chunk=2,
        feature_lr=0.05, opacity_lr=0.05,
    )
    tr = Trainer(model, ds, cfg, log_fn=lambda *a: None)
    first = None
    for i, (P, K, imgs, idx) in enumerate(ds.batches(2, seed=1)):
        m = tr.run_step(P, K, imgs, mask=ds.pixel_mask(idx))
        assert bool(m["grads_finite"])
        if first is None:
            first = float(m["loss"])
        if i >= 29:
            break
    assert float(m["loss"]) < 0.6 * first, (first, float(m["loss"]))


def test_cull_is_path_agnostic_xla_vs_routed():
    """The alpha-floor cull must drop the SAME pairs on the id-table (XLA)
    path and the routed pallas path: render_params must hand binning the
    packed attr columns even when use_pallas=False (a silently skipped cull
    made the two paths composite different pair sets — caught on v5e by
    device_check's cull configs)."""
    from jax.experimental.pallas import tpu as pltpu

    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render_params

    n, W, H, cull = 400, 64, 64, 1.0 / 255
    rng = np.random.default_rng(5)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz[:, 2] = xyz[:, 2] * 0.5 + 6
    model = init_from_points(xyz, np.full(n, 0.2, np.float32))
    sh = np.array(model.sh)
    sh[0:3, :n] = rng.uniform(0.2, 2.5, (n, 3)).T
    model = model._replace(sh=jnp.asarray(sh))
    P = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    K = jnp.asarray([[[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]])
    target = jnp.zeros((1, H, W, 3), jnp.float32)
    params = model.trainable()

    def loss(p, cfg):
        im, _ = render_params(p, model.alive, P, K, (W, H), cfg)
        return jnp.mean((im - target) ** 2)

    base = dict(tile_size=16, max_per_tile=64, max_pairs=8192,
                cull_alpha_min=cull)
    lx, gx = jax.value_and_grad(loss)(
        params, RenderConfig(tile_chunk=4, **base)
    )
    with pltpu.force_tpu_interpret_mode():
        lr, gr = jax.value_and_grad(loss)(
            params, RenderConfig(use_pallas=True, **base)
        )
    np.testing.assert_allclose(float(lx), float(lr), rtol=1e-5, atol=1e-7)
    for k in gx:
        a, b = np.asarray(gx[k]), np.asarray(gr[k])
        np.testing.assert_allclose(
            a, b, rtol=1e-3, atol=1e-5 * (np.abs(a).max() + 1e-12),
            err_msg=k,
        )


def test_binning_rejects_cull_without_attrs():
    from simplegaussiansplat_tk71_tpu.ops import binning

    mean2d = jnp.zeros((2, 8))
    bbox = jnp.ones((2, 8))
    depth = jnp.ones((8,))
    valid = jnp.ones((8,), bool)
    with pytest.raises(ValueError, match="requires attrs"):
        binning.bin_gaussians(
            mean2d, bbox, depth, valid, (64, 64), tile_size=16,
            max_pairs=256, max_per_tile=32, cull_alpha_min=1.0 / 255,
        )


def test_nonfinite_step_skipped():
    """A batch that produces a non-finite loss/grads must not change params,
    optimizer state, or densify stats (regression: r3b quality run step
    10826 — one transient non-finite batch poisoned Adam and every later
    step was NaN). The step after it must train normally."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
    from simplegaussiansplat_tk71_tpu.train.trainer import Trainer
    from test_train import _synthetic_scene

    gt, scene, images = _synthetic_scene(seed=11)
    ds = SceneDataset(scene, images=images)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
    )
    cfg = TrainConfig(
        batch_size=2, densify_from_iter=10_000, opacity_reset_interval=0,
        tile_size=16, max_per_tile=64, tile_chunk=2,
    )
    tr = Trainer(model, ds, cfg, log_fn=lambda *a: None)
    batches = ds.batches(2, seed=0)
    P, K, imgs, _ = next(batches)

    m0 = tr.run_step(P, K, imgs)
    assert bool(m0["grads_finite"])
    params_before = jax.tree.map(np.asarray, tr.model.trainable())
    opt_before = jax.tree.map(np.asarray, tr.opt_state)
    stats_before = jax.tree.map(np.asarray, tr.stats)

    bad = jnp.asarray(np.asarray(imgs)).at[0, 0, 0, 0].set(np.nan)
    m1 = tr.run_step(P, K, bad)
    assert not bool(m1["grads_finite"])
    for a, b in zip(
        jax.tree.leaves(params_before),
        jax.tree.leaves(jax.tree.map(np.asarray, tr.model.trainable())),
    ):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(
        jax.tree.leaves(opt_before),
        jax.tree.leaves(jax.tree.map(np.asarray, tr.opt_state)),
    ):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(
        jax.tree.leaves(stats_before),
        jax.tree.leaves(jax.tree.map(np.asarray, tr.stats)),
    ):
        np.testing.assert_array_equal(a, b)

    # recovery: the next clean step trains and changes params
    m2 = tr.run_step(P, K, imgs)
    assert bool(m2["grads_finite"])
    assert np.isfinite(float(m2["loss"]))
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(params_before),
            jax.tree.leaves(tr.model.trainable()),
        )
    )
    assert changed
