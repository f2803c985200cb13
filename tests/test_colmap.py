import os
import struct

import numpy as np
import pytest

from simplegaussiansplat_tk71_tpu.data import colmap
from simplegaussiansplat_tk71_tpu.native import load_native_lib

REF_SPARSE = "/root/reference/colmap/sparse/0"


def _write_synthetic_model(d):
    """Write tiny cameras.bin / images.bin / points3D.bin."""
    rng = np.random.default_rng(0)
    # cameras: one PINHOLE, one SIMPLE_RADIAL
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
        f.write(struct.pack("<iiQQ", 2, 2, 320, 240))
        f.write(struct.pack("<4d", 260.0, 160.0, 120.0, 0.05))
    # images
    imgs = [
        (7, [0.9, 0.1, 0.2, 0.3], [1.0, 2.0, 3.0], 1, b"a.jpg", 2),
        (3, [1.0, 0.0, 0.0, 0.0], [-1.0, 0.5, 0.0], 2, b"b.jpg", 0),
    ]
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(imgs)))
        for iid, q, t, cid, name, n2d in imgs:
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", cid))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", n2d))
            for k in range(n2d):
                f.write(struct.pack("<ddq", 1.0 * k, 2.0 * k, -1))
    # points3D
    pts = rng.normal(size=(5, 3))
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i, p in enumerate(pts):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", *p))
            f.write(bytes([i, 2 * i, 3 * i]))
            f.write(struct.pack("<d", 0.5))
            track = i % 3
            f.write(struct.pack("<Q", track))
            for k in range(track):
                f.write(struct.pack("<ii", k, k))
    return pts


def test_synthetic_roundtrip(tmp_path):
    pts = _write_synthetic_model(str(tmp_path))
    cams = colmap.read_cameras_bin(str(tmp_path / "cameras.bin"))
    assert cams[1]["model"] == "PINHOLE" and cams[1]["fx"] == 500.0
    assert cams[2]["model"] == "SIMPLE_RADIAL"
    assert cams[2]["fx"] == cams[2]["fy"] == 260.0
    assert cams[2]["cx"] == 160.0 and cams[2]["cy"] == 120.0
    imgs = colmap.read_images_bin(str(tmp_path / "images.bin"))
    assert set(imgs.keys()) == {7, 3}
    assert imgs[7]["name"] == "a.jpg" and imgs[7]["camera_id"] == 1
    np.testing.assert_allclose(imgs[3]["tvec"], [-1.0, 0.5, 0.0])
    xyz, rgb = colmap.read_points3d_bin(str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(xyz, pts, atol=1e-6)
    assert rgb[2].tolist() == [2, 4, 6]


def test_native_matches_python(tmp_path):
    if load_native_lib() is None:
        pytest.skip("no C++ toolchain")
    _write_synthetic_model(str(tmp_path))
    cams_n = colmap.read_cameras_bin(str(tmp_path / "cameras.bin"))
    cams_p = colmap._read_cameras_bin_py(str(tmp_path / "cameras.bin"))
    for cid in cams_p:
        for key in ("model", "width", "height", "fx", "fy", "cx", "cy"):
            assert cams_n[cid][key] == cams_p[cid][key], (cid, key)
    imgs_n = colmap.read_images_bin(str(tmp_path / "images.bin"))
    imgs_p = colmap._read_images_bin_py(str(tmp_path / "images.bin"))
    assert set(imgs_n) == set(imgs_p)
    for iid in imgs_p:
        np.testing.assert_allclose(imgs_n[iid]["qvec"], imgs_p[iid]["qvec"])
        np.testing.assert_allclose(imgs_n[iid]["tvec"], imgs_p[iid]["tvec"])
        assert imgs_n[iid]["name"] == imgs_p[iid]["name"]
    xyz_n, rgb_n = colmap.read_points3d_bin(str(tmp_path / "points3D.bin"))
    xyz_p, rgb_p = colmap._read_points3d_bin_py(str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(xyz_n, xyz_p, atol=1e-6)
    np.testing.assert_array_equal(rgb_n, rgb_p)


@pytest.mark.skipif(not os.path.exists(REF_SPARSE), reason="no reference data")
def test_reference_binaries_native_vs_python():
    cams_n = colmap.read_cameras_bin(os.path.join(REF_SPARSE, "cameras.bin"))
    cams_p = colmap._read_cameras_bin_py(os.path.join(REF_SPARSE, "cameras.bin"))
    assert len(cams_n) == len(cams_p) == 100
    for cid in cams_p:
        assert abs(cams_n[cid]["fx"] - cams_p[cid]["fx"]) < 1e-9
    xyz_n, rgb_n = colmap.read_points3d_bin(os.path.join(REF_SPARSE, "points3D.bin"))
    xyz_p, rgb_p = colmap._read_points3d_bin_py(os.path.join(REF_SPARSE, "points3D.bin"))
    assert len(xyz_n) == len(xyz_p) == 10409
    np.testing.assert_allclose(xyz_n, xyz_p, atol=1e-5)
    np.testing.assert_array_equal(rgb_n, rgb_p)
