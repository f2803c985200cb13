"""COLMAP binary scene writer — the inverse of data/colmap.py's parser.

The reference ships its one dataset as a COLMAP bundle (`colmap/` with
sparse/0/*.bin; gs_load_colmap.py reads it) but upstream stripped images.bin,
so the bundled scene cannot actually be trained. This writer lets us ship a
complete, runnable example bundle (examples/make_example_scene.py) and lets
users export any SyntheticCapture to the exact on-disk format `cli train`
consumes.

Formats follow COLMAP's binary spec as read by our parser (data/colmap.py)
and the reference's loader (gs_load_colmap.py:34-116): cameras.bin entries
are (camera_id, model_id, w, h, params[]) with PINHOLE model_id=1 and params
(fx, fy, cx, cy); images.bin entries carry (id, qvec wxyz, tvec, camera_id,
name, 0 points2D); points3D.bin entries carry (id, xyz f64, rgb u8x3, error,
0-length track).
"""

import os
import struct

import numpy as np


def rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """World->cam rotation matrix to COLMAP (w, x, y, z) quaternion."""
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def write_colmap_bins(root, P, K, wh, image_names, xyz, rgb=None):
    """Write sparse/0/{cameras,images,points3D}.bin under ``root``.

    P: (M, 3, 4) world->cam extrinsics; K: (M, 3, 3) intrinsics;
    wh: (M, 2) image sizes; xyz: (N, 3) SfM points; rgb: (N, 3) in [0, 1].
    One PINHOLE camera entry per image (supports per-image sizes — the
    capability restored in round 2; gs_load_colmap.py:114-115).
    """
    P = np.asarray(P)
    K = np.asarray(K)
    wh = np.asarray(wh)
    M = len(P)
    sp = os.path.join(root, "sparse", "0")
    os.makedirs(sp, exist_ok=True)

    with open(os.path.join(sp, "cameras.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", M))
        for i in range(M):
            fh.write(struct.pack("<iiQQ", i + 1, 1, int(wh[i, 0]), int(wh[i, 1])))
            fh.write(struct.pack(
                "<4d", K[i, 0, 0], K[i, 1, 1], K[i, 0, 2], K[i, 1, 2]))

    with open(os.path.join(sp, "images.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", M))
        for i in range(M):
            q = rotmat_to_qvec(P[i, :, :3])
            fh.write(struct.pack("<i", i + 1))
            fh.write(struct.pack("<4d", *q))
            fh.write(struct.pack("<3d", *P[i, :, 3].astype(np.float64)))
            fh.write(struct.pack("<i", i + 1))
            fh.write(image_names[i].encode() + b"\x00")
            fh.write(struct.pack("<Q", 0))

    xyz = np.asarray(xyz, np.float64)
    if rgb is None:
        rgb_u8 = np.full((len(xyz), 3), 128, np.uint8)
    else:
        rgb_u8 = np.clip(np.asarray(rgb) * 255.0, 0, 255).astype(np.uint8)
    with open(os.path.join(sp, "points3D.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            fh.write(struct.pack("<Q", i))
            fh.write(struct.pack("<3d", *xyz[i]))
            fh.write(bytes(rgb_u8[i]))
            fh.write(struct.pack("<d", 0.1))
            fh.write(struct.pack("<Q", 0))


def write_capture_scene(root, cap, images):
    """Serialize a SyntheticCapture + rendered views as a full COLMAP bundle
    (sparse/0/*.bin + images/*.png) that `cli train --scene root` consumes."""
    from simplegaussiansplat_tk71_tpu.utils.logging import save_png

    names = [f"view_{i:03d}.png" for i in range(len(cap.P))]
    write_colmap_bins(root, cap.P, cap.K, cap.wh, names, cap.sfm_xyz, cap.sfm_rgb)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    for i, name in enumerate(names):
        save_png(os.path.join(root, "images", name),
                 np.clip(np.asarray(images[i]), 0.0, 1.0))
    return root
