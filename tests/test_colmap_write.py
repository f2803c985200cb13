"""colmap_write round-trips through our parser (C16 dataset bundle)."""

import numpy as np

from simplegaussiansplat_tk71_tpu.data.colmap import load_colmap_scene
from simplegaussiansplat_tk71_tpu.data.colmap_write import (
    rotmat_to_qvec,
    write_capture_scene,
)
from simplegaussiansplat_tk71_tpu.data.synthetic import make_courtyard_capture


def _qvec_rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_rotmat_qvec_roundtrip_all_branches():
    rng = np.random.default_rng(7)
    for _ in range(50):
        # random rotation via QR (covers all four Shepperd branches)
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        q = rotmat_to_qvec(Q)
        assert np.allclose(_qvec_rotmat(q), Q, atol=1e-8)


def test_write_capture_scene_roundtrip(tmp_path):
    cap = make_courtyard_capture(
        n_cams=4, width=48, height=36, gt_points_scale=0.02, sfm_points=120)
    images = np.zeros((4, 36, 48, 3), np.float32)
    images[:, :18] = 0.5
    root = write_capture_scene(str(tmp_path / "scene"), cap, images)

    scene = load_colmap_scene(root)
    assert len(scene.P) == 4
    np.testing.assert_allclose(scene.P, cap.P, atol=1e-5)
    np.testing.assert_allclose(scene.K, cap.K, atol=1e-4)
    np.testing.assert_array_equal(scene.wh, cap.wh)
    np.testing.assert_allclose(scene.xyz, cap.sfm_xyz, atol=1e-6)

    # the PNGs round-trip through the image loader via SceneDataset
    from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset

    ds = SceneDataset(scene, root_dir=root)
    got = ds.get_images(np.arange(4))
    assert got.shape == (4, 36, 48, 3)
    np.testing.assert_allclose(got, images, atol=2 / 255)
