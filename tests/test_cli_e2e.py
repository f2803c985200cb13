"""End-to-end CLI integration: a full COLMAP dataset on disk -> train -> eval.

Synthesizes a complete scene the way COLMAP would deliver it (cameras.bin,
images.bin, points3D.bin, images/*.png rendered from a ground-truth model),
then drives the real CLI entry points: info, train (with checkpoints +
metrics), render, eval. This covers the whole reference workflow
(gs.py -> Control.learning -> dataset -> train -> save) through our stack.
"""

import json
import os
import struct
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
from simplegaussiansplat_tk71_tpu.render import RenderConfig, render
from simplegaussiansplat_tk71_tpu.utils.logging import save_png


def _write_colmap_scene(root, W=64, H=48, n=60, n_cams=6, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "sparse", "0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    f = 1.2 * W

    # ground-truth model
    xyz = (rng.normal(size=(n, 3)) * 0.7).astype(np.float32)
    xyz[:, 2] += 4.0
    gt = init_from_points(xyz, np.full(n, 0.15, np.float32), capacity=64)
    sh = np.array(gt.sh)
    sh[0:3, :n] = rng.uniform(0.5, 3.0, size=(n, 3)).T
    gt = gt._replace(sh=jnp.asarray(sh))

    # cameras.bin: single PINHOLE camera
    with open(os.path.join(root, "sparse/0/cameras.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        fh.write(struct.pack("<iiQQ", 1, 1, W, H))
        fh.write(struct.pack("<4d", f, f, W / 2, H / 2))

    # poses: slight yaw orbit; write images.bin and render each view
    cfg = RenderConfig(tile_size=16, max_per_tile=64, tile_chunk=4)
    with open(os.path.join(root, "sparse/0/images.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", n_cams))
        for i in range(n_cams):
            ang = 0.1 * (i - n_cams / 2)
            c, s = np.cos(ang / 2), np.sin(ang / 2)
            qvec = [c, 0.0, s, 0.0]  # (w, x, y, z): yaw about +y
            tvec = [0.3 * (i - n_cams / 2) / n_cams, 0.0, 0.0]
            name = f"view_{i:03d}.png"
            fh.write(struct.pack("<i", i + 1))
            fh.write(struct.pack("<4d", *qvec))
            fh.write(struct.pack("<3d", *tvec))
            fh.write(struct.pack("<i", 1))
            fh.write(name.encode() + b"\x00")
            fh.write(struct.pack("<Q", 0))
            # render this view with the same pose math the loader uses
            w_, x_, y_, z_ = qvec
            R = np.array([
                [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_), 2 * (x_ * z_ + w_ * y_)],
                [2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_), 2 * (y_ * z_ - w_ * x_)],
                [2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_), 1 - 2 * (x_ * x_ + y_ * y_)],
            ], np.float32)
            P = np.concatenate([R, np.asarray(tvec, np.float32)[:, None]], 1)
            K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
            img, _ = render(gt, jnp.asarray(P)[None], jnp.asarray(K)[None], (W, H), cfg)
            save_png(os.path.join(root, "images", name), np.asarray(img[0]))

    # points3D.bin from the true positions (what SfM would give)
    with open(os.path.join(root, "sparse/0/points3D.bin"), "wb") as fh:
        fh.write(struct.pack("<Q", n))
        for i in range(n):
            fh.write(struct.pack("<Q", i))
            fh.write(struct.pack("<3d", *xyz[i].astype(np.float64)))
            fh.write(bytes([128, 128, 128]))
            fh.write(struct.pack("<d", 0.1))
            fh.write(struct.pack("<Q", 0))
    return root


def _run_cli(*args):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run(
        [sys.executable, "-m", "simplegaussiansplat_tk71_tpu.cli", *args],
        capture_output=True, text=True, env=env, timeout=600,
    )


@pytest.mark.slow
def test_full_cli_workflow(tmp_path):
    scene = _write_colmap_scene(str(tmp_path / "scene"))
    out = str(tmp_path / "run")

    r = _run_cli("info", "--scene", scene)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "cameras: 6" in r.stdout and "points3D: 60" in r.stdout

    r = _run_cli(
        "train", "--scene", scene, "--out", out, "--steps", "25",
        "--batch-size", "2", "--densify-from-iter", "5",
        "--densify-until-iter", "20", "--densification-interval", "10",
        "--tile-size", "16", "--max-per-tile", "64", "--tile-chunk", "4",
        "--checkpoint-every", "10", "--grad-threshold", "0.0004",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(out, "ckpt_20.npz"))
    metrics = [
        json.loads(line)
        for line in open(os.path.join(out, "metrics.jsonl"))
    ]
    assert metrics[-1]["step"] == 25
    assert metrics[-1]["loss"] < metrics[0]["loss"]
    assert all(m["grads_finite"] == 1.0 for m in metrics)

    r = _run_cli(
        "render", "--checkpoint", os.path.join(out, "ckpt_20.npz"),
        "--scene", scene, "--out", str(tmp_path / "renders"), "--count", "2",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(tmp_path / "renders" / "render_0000.png")

    r = _run_cli(
        "eval", "--checkpoint", os.path.join(out, "ckpt_20.npz"),
        "--scene", scene, "--count", "3",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mean over 3" in r.stdout
    # trained for 25 steps from the true point cloud: should be > 20 dB
    mean_psnr = float(r.stdout.split("psnr=")[-1].split()[0])
    assert mean_psnr > 20.0, r.stdout

    # viewer interchange: checkpoint -> official-3DGS PLY -> loadable model
    ply = str(tmp_path / "model.ply")
    r = _run_cli(
        "export-ply", "--checkpoint", os.path.join(out, "ckpt_20.npz"),
        "--out", ply,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wrote" in r.stdout

    from simplegaussiansplat_tk71_tpu.data.ply import load_ply

    m = load_ply(ply)
    assert int(m.num_alive()) > 0 and m.sh_degree == 2
