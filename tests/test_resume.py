import os

import numpy as np
import pytest

from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset
from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
from simplegaussiansplat_tk71_tpu.train.checkpoint import latest_checkpoint, save_checkpoint
from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
from simplegaussiansplat_tk71_tpu.train.trainer import Trainer

from test_train import _synthetic_scene


def test_latest_checkpoint(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    for s in (100, 1000, 200):
        open(tmp_path / f"ckpt_{s}.npz", "w").close()
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_1000.npz")


@pytest.mark.slow
def test_restore_resumes_training(tmp_path):
    gt, scene, images = _synthetic_scene(seed=8)
    ds = SceneDataset(scene, images=images)
    cfg = TrainConfig(
        batch_size=2, densify_from_iter=10_000, opacity_reset_interval=0,
        tile_size=16, max_per_tile=64, tile_chunk=2,
    )

    def make():
        model = init_from_points(
            scene.xyz, np.full(len(scene.xyz), 0.25, np.float32), capacity=64
        )
        return Trainer(model, ds, cfg, log_fn=lambda *a: None)

    tr = make()
    it = ds.batches(2, seed=1)
    for _ in range(4):
        P, K, imgs, _ = next(it)
        tr.run_step(P, K, imgs)
    path = os.path.join(tmp_path, "ckpt_4.npz")
    save_checkpoint(path, tr.model, tr.opt_state, tr.stats, tr.step)
    # continue the original 2 more steps
    batches = [next(it) for _ in range(2)]
    for P, K, imgs, _ in batches:
        m_orig = tr.run_step(P, K, imgs)

    # fresh trainer restored from the checkpoint, same continued batches
    tr2 = make()
    assert tr2.restore(path) == 4
    for P, K, imgs, _ in batches:
        m_res = tr2.run_step(P, K, imgs)

    np.testing.assert_allclose(
        np.asarray(tr.model.mean), np.asarray(tr2.model.mean), atol=1e-6
    )
    np.testing.assert_allclose(
        float(m_orig["loss"]), float(m_res["loss"]), rtol=1e-6
    )
