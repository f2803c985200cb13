"""Overflow adaptation: max_pairs doubling + post-densify-phase polling.

Round-4 additions (VERDICT round-3 next #3: truncated > 0 is a failed
invariant, not a metric): (a) pair-buffer overflow (dropped_pairs) doubles
max_pairs at the overflow-check cadence; (b) the truncation/overflow checks
keep running after densification ends, when there are no densify events to
carry the accumulators (exactly the phase where the r3b run was left
dropping ~2.3k fragments/step with no mechanism to react).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simplegaussiansplat_tk71_tpu.data.colmap import ColmapScene
from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
from simplegaussiansplat_tk71_tpu.train.trainer import Trainer
from simplegaussiansplat_tk71_tpu.utils.knn import knn_mean_dist


def _tiny_setup(n=60, W=64, H=48, **cfg_kw):
    rng = np.random.default_rng(0)
    xyz = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    xyz[:, 2] += 4.0
    P = np.tile(np.eye(3, 4, dtype=np.float32)[None], (3, 1, 1))
    P[1, 2, 3] = 0.3
    P[2, 0, 3] = 0.2
    K = np.tile(
        np.array([[[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]]],
                 np.float32), (3, 1, 1),
    )
    scene = ColmapScene(
        xyz=xyz, rgb=np.full((n, 3), 128, np.uint8),
        P=P, K=K, wh=np.tile([[W, H]], (3, 1)).astype(np.int32),
        image_names=[f"c{i}" for i in range(3)],
    )
    images = rng.uniform(0, 1, (3, H, W, 3)).astype(np.float32)
    ds = SceneDataset(scene, images=images)
    cfg = TrainConfig(use_pallas=False, batch_size=1, **cfg_kw)
    model = init_from_points(
        xyz, knn_mean_dist(xyz, 3), opacity_init=0.9, sh_degree=cfg.sh_degree
    )
    return Trainer(model, ds, cfg, log_fn=lambda *a: None), ds, cfg


def _run(trainer, ds, cfg, steps):
    for P, K, imgs, _ in ds.batches(cfg.batch_size, seed=0):
        trainer.run_step(P, K, imgs)
        if trainer.step >= steps:
            break


def test_max_pairs_doubles_on_overflow():
    # 60 gaussians with fat screen footprints across 12 tiles but only 32
    # pair slots: guaranteed overflow -> the densify-event check must double
    # max_pairs (and the step function keeps working after the recompile)
    trainer, ds, cfg = _tiny_setup(
        max_pairs=32, max_per_tile=64,
        densify_from_iter=1, densify_until_iter=100,
        densification_interval=2, adapt_max_pairs=True,
        max_pairs_limit=4096,
    )
    assert trainer.render_cfg.max_pairs == 32
    _run(trainer, ds, cfg, steps=2)  # first densify event checks overflow
    assert trainer.render_cfg.max_pairs == 64
    m = trainer.run_step(*_first_batch(ds, cfg))  # recompiled step works
    assert np.isfinite(float(m["loss"]))


def test_post_densify_truncation_polling():
    # densification is OVER (until_iter=0); per-tile K=4 with ~60 gaussians
    # on a handful of tiles truncates heavily. The post-densify poll at the
    # event cadence must still double max_per_tile.
    trainer, ds, cfg = _tiny_setup(
        max_per_tile=4, max_pairs=4096,
        densify_from_iter=1, densify_until_iter=0,
        densification_interval=3,
        adapt_max_per_tile=True, adapt_trunc_final_per_step=0.0,
        max_per_tile_limit=64, opacity_reset_interval=0,
    )
    assert trainer.render_cfg.max_per_tile == 4
    _run(trainer, ds, cfg, steps=3)
    assert trainer.render_cfg.max_per_tile == 8
    # keeps going in later windows until truncation stops or limit reached
    _run(trainer, ds, cfg, steps=6)
    assert trainer.render_cfg.max_per_tile == 16


def test_checkpoint_roundtrips_adapted_state(tmp_path):
    from simplegaussiansplat_tk71_tpu.train.checkpoint import save_checkpoint

    trainer, ds, cfg = _tiny_setup(
        max_pairs=32, max_per_tile=4,
        densify_from_iter=1, densify_until_iter=0,
        densification_interval=3, adapt_trunc_final_per_step=0.0,
        max_per_tile_limit=64, max_pairs_limit=4096,
        opacity_reset_interval=0,
    )
    _run(trainer, ds, cfg, steps=3)
    k, p = trainer.render_cfg.max_per_tile, trainer.render_cfg.max_pairs
    assert (k, p) != (4, 32), "adaptation should have fired"
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, trainer.model, trainer.opt_state, trainer.stats,
                    trainer.step, extra=trainer.checkpoint_extra())
    fresh, _, _ = _tiny_setup(
        max_pairs=32, max_per_tile=4,
        densify_from_iter=1, densify_until_iter=0,
        densification_interval=3, max_per_tile_limit=64,
        max_pairs_limit=4096, opacity_reset_interval=0,
    )
    fresh.restore(path)
    assert fresh.render_cfg.max_per_tile == k
    assert fresh.render_cfg.max_pairs == p


def _first_batch(ds, cfg):
    for P, K, imgs, _ in ds.batches(cfg.batch_size, seed=1):
        return P, K, imgs
