"""debug_nan_checks: the checkify sanitizer behind TrainConfig's debug flag
(SURVEY section 5 — the reference's check_nan is commented out; ours raises)."""

import numpy as np
import pytest

from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
from simplegaussiansplat_tk71_tpu.train.trainer import Trainer

from test_train import _synthetic_scene


def _cfg():
    return TrainConfig(
        batch_size=2, densify_from_iter=10_000, opacity_reset_interval=0,
        tile_size=16, max_per_tile=64, tile_chunk=2, debug_nan_checks=True,
    )


def test_clean_step_passes_under_checkify():
    gt, scene, images = _synthetic_scene()
    ds = SceneDataset(scene, images=images)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
    )
    tr = Trainer(model, ds, _cfg(), log_fn=lambda *a: None)
    it = ds.batches(2, seed=1)
    P, K, imgs, _ = next(it)
    m = tr.run_step(P, K, imgs)
    assert np.isfinite(float(m["loss"]))


def test_injected_nan_raises_with_location():
    gt, scene, images = _synthetic_scene()
    ds = SceneDataset(scene, images=images)
    model = init_from_points(
        scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
    )
    tr = Trainer(model, ds, _cfg(), log_fn=lambda *a: None)
    it = ds.batches(2, seed=1)
    P, K, imgs, _ = next(it)
    bad = np.array(imgs)
    bad[0, 0, 0, 0] = np.nan
    with pytest.raises(Exception, match="non-finite"):
        tr.run_step(P, K, bad)
