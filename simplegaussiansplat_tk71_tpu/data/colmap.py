"""COLMAP binary model parser (no pycolmap dependency).

Replaces the reference's pycolmap wrapper (gs_load_colmap.py:30-137) with a
self-contained reader of COLMAP's documented binary format:

  cameras.bin : camera_id i32, model_id i32, width u64, height u64, params f64[]
  images.bin  : image_id i32, qvec f64[4] (w,x,y,z), tvec f64[3], camera_id i32,
                name cstr, num_points2D u64, points2D (f64 x, f64 y, i64 pid)[]
  points3D.bin: point_id u64, xyz f64[3], rgb u8[3], error f64,
                track_len u64, track (i32 image_id, i32 point2D_idx)[]

Output matches the reference's tensor contract (gs_load_colmap.py:66-117):
xyz point cloud, per-image world->cam P (3, 4), intrinsics K (3, 3), image
sizes wh, and image names.

Intrinsics note: for single-focal models (SIMPLE_PINHOLE, SIMPLE_RADIAL, ...)
params are (f, cx, cy, ...). The reference maps only SIMPLE_PINHOLE and
SIMPLE_RADIAL that way and reads RADIAL's (f, cx, cy, k1) as (fx, fy, cx, cy)
— a bug (gs_load_colmap.py:102-106). We map every model by its real layout.
Distortion coefficients are ignored (as in the reference).
"""

import os
import struct
from dataclasses import dataclass, field

import numpy as np

# model_id -> (name, num_params, single_focal)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3, True),
    1: ("PINHOLE", 4, False),
    2: ("SIMPLE_RADIAL", 4, True),
    3: ("RADIAL", 5, True),
    4: ("OPENCV", 8, False),
    5: ("OPENCV_FISHEYE", 8, False),
    6: ("FULL_OPENCV", 12, False),
    7: ("FOV", 5, False),
    8: ("SIMPLE_RADIAL_FISHEYE", 4, True),
    9: ("RADIAL_FISHEYE", 5, True),
    10: ("THIN_PRISM_FISHEYE", 12, False),
}


@dataclass
class ColmapScene:
    xyz: np.ndarray  # (N, 3) float32 SfM points
    rgb: np.ndarray  # (N, 3) uint8 point colors
    P: np.ndarray  # (M, 3, 4) float32 world->camera
    K: np.ndarray  # (M, 3, 3) float32 intrinsics
    wh: np.ndarray  # (M, 2) int32 (width, height)
    image_names: list = field(default_factory=list)


def _qvec_wxyz_to_rotmat(q):
    """COLMAP (w, x, y, z) quaternion -> rotation matrix (cam_from_world)."""
    w, x, y, z = q
    n = np.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _native_lib():
    from simplegaussiansplat_tk71_tpu.native import load_native_lib

    return load_native_lib()


def read_cameras_bin(path: str) -> dict:
    lib = _native_lib()
    if lib is not None:
        import ctypes

        n = lib.colmap_read_cameras(path.encode(), None, None, None, None, 0)
        if n >= 0:
            ids = np.empty(n, np.int32)
            model = np.empty(n, np.int32)
            wh = np.empty((n, 2), np.int32)
            k4 = np.empty((n, 4), np.float64)
            r = lib.colmap_read_cameras(
                path.encode(),
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                model.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                wh.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                k4.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                n,
            )
            if r == n:
                cams = {}
                for i in range(n):
                    name, nparams, _ = CAMERA_MODELS[int(model[i])]
                    cams[int(ids[i])] = {
                        "model": name,
                        "width": int(wh[i, 0]),
                        "height": int(wh[i, 1]),
                        "fx": k4[i, 0],
                        "fy": k4[i, 1],
                        "cx": k4[i, 2],
                        "cy": k4[i, 3],
                        "params": None,
                    }
                return cams
    return _read_cameras_bin_py(path)


def _read_cameras_bin_py(path: str) -> dict:
    cams = {}
    with open(path, "rb") as f:
        data = f.read()
    (num,) = struct.unpack_from("<Q", data, 0)
    off = 8
    for _ in range(num):
        cam_id, model_id, width, height = struct.unpack_from("<iiQQ", data, off)
        off += 24
        name, nparams, single_focal = CAMERA_MODELS[model_id]
        params = np.frombuffer(data, "<f8", count=nparams, offset=off)
        off += 8 * nparams
        if single_focal:
            fx = fy = params[0]
            cx, cy = params[1], params[2]
        else:
            fx, fy, cx, cy = params[0], params[1], params[2], params[3]
        cams[cam_id] = {
            "model": name,
            "width": int(width),
            "height": int(height),
            "fx": fx,
            "fy": fy,
            "cx": cx,
            "cy": cy,
            "params": params,
        }
    return cams


def read_images_bin(path: str) -> dict:
    lib = _native_lib()
    if lib is not None:
        import ctypes

        n = lib.colmap_read_images(
            path.encode(), None, None, None, None, None, 0, 0
        )
        if n >= 0:
            image_id = np.empty(n, np.int32)
            qvec = np.empty((n, 4), np.float64)
            tvec = np.empty((n, 3), np.float64)
            cam_id = np.empty(n, np.int32)
            name_cap = 4096 * max(n, 1)
            names_buf = ctypes.create_string_buffer(name_cap)
            r = lib.colmap_read_images(
                path.encode(),
                image_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                qvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                tvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                cam_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                names_buf,
                n,
                name_cap,
            )
            if r == n:
                names = names_buf.raw.split(b"\x00")[:n]
                return {
                    int(image_id[i]): {
                        "qvec": qvec[i],
                        "tvec": tvec[i],
                        "camera_id": int(cam_id[i]),
                        "name": names[i].decode("utf-8"),
                    }
                    for i in range(n)
                }
    return _read_images_bin_py(path)


def _read_images_bin_py(path: str) -> dict:
    imgs = {}
    with open(path, "rb") as f:
        data = f.read()
    (num,) = struct.unpack_from("<Q", data, 0)
    off = 8
    for _ in range(num):
        image_id = struct.unpack_from("<i", data, off)[0]
        off += 4
        qvec = np.frombuffer(data, "<f8", count=4, offset=off)
        off += 32
        tvec = np.frombuffer(data, "<f8", count=3, offset=off)
        off += 24
        camera_id = struct.unpack_from("<i", data, off)[0]
        off += 4
        end = data.index(b"\x00", off)
        name = data[off:end].decode("utf-8")
        off = end + 1
        (n2d,) = struct.unpack_from("<Q", data, off)
        off += 8 + 24 * n2d  # skip points2D (x f64, y f64, pid i64)
        imgs[image_id] = {"qvec": qvec, "tvec": tvec, "camera_id": camera_id, "name": name}
    return imgs


def read_points3d_bin(path: str):
    lib = _native_lib()
    if lib is not None:
        import ctypes

        n = lib.colmap_read_points3d(path.encode(), None, None, 0)
        if n >= 0:
            xyz = np.empty((n, 3), np.float32)
            rgb = np.empty((n, 3), np.uint8)
            r = lib.colmap_read_points3d(
                path.encode(),
                xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                n,
            )
            if r == n:
                return xyz.astype(np.float64), rgb
    return _read_points3d_bin_py(path)


def _read_points3d_bin_py(path: str):
    with open(path, "rb") as f:
        data = f.read()
    (num,) = struct.unpack_from("<Q", data, 0)
    off = 8
    xyz = np.empty((num, 3), np.float64)
    rgb = np.empty((num, 3), np.uint8)
    for i in range(num):
        # point_id u64 (8) + xyz 3*f8 (24) + rgb 3*u1 (3) + error f8 (8)
        xyz[i] = np.frombuffer(data, "<f8", count=3, offset=off + 8)
        rgb[i] = np.frombuffer(data, "<u1", count=3, offset=off + 32)
        (track_len,) = struct.unpack_from("<Q", data, off + 43)
        off += 51 + 8 * track_len
    return xyz, rgb


def load_colmap_scene(root_dir: str, sparse_subdir: str = "sparse/0") -> ColmapScene:
    """Load a COLMAP reconstruction rooted like the reference's dataset
    (<root>/sparse/0/{cameras,images,points3D}.bin, images in <root>/images/)."""
    sparse = os.path.join(root_dir, sparse_subdir)
    cams = read_cameras_bin(os.path.join(sparse, "cameras.bin"))
    imgs = read_images_bin(os.path.join(sparse, "images.bin"))
    xyz, rgb = read_points3d_bin(os.path.join(sparse, "points3D.bin"))

    M = len(imgs)
    P = np.zeros((M, 3, 4), np.float32)
    K = np.zeros((M, 3, 3), np.float32)
    wh = np.zeros((M, 2), np.int32)
    names = []
    for i, image_id in enumerate(sorted(imgs.keys())):
        img = imgs[image_id]
        cam = cams[img["camera_id"]]
        R = _qvec_wxyz_to_rotmat(img["qvec"])
        P[i, :, :3] = R
        P[i, :, 3] = img["tvec"]
        K[i] = [[cam["fx"], 0, cam["cx"]], [0, cam["fy"], cam["cy"]], [0, 0, 1]]
        wh[i] = [cam["width"], cam["height"]]
        names.append(img["name"])
    return ColmapScene(
        xyz=xyz.astype(np.float32),
        rgb=rgb,
        P=P,
        K=K,
        wh=wh,
        image_names=names,
    )
