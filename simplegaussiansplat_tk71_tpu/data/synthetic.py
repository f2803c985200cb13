"""Procedural multi-view scene synthesis at the reference capture's scale.

The reference's one real dataset (colmap/: the 100-image south-building
capture, resized to width 400 — image_resize.bat:6-8) cannot be trained here
because its images.bin was stripped upstream (.MISSING_LARGE_BLOBS). This
module synthesizes a comparable capture — a structured "courtyard" scene
(ground plane, a building with window patterns, a tower, trees) represented
as a ground-truth Gaussian model, photographed by a ring of ~100 cameras at
the reference's image scale — so end-to-end quality (PSNR/SSIM vs. held-out
views) is measurable at the reference's 30k-iteration schedule and its
~514k-gaussian end state (opacity.pt; save code gs_control.py:226-231).

Ground truth is renderable by construction, so PSNR measures the trainer's
ability to recover a real radiance field from a sparse SfM-like init through
densification — the same capability the reference demonstrates on
south-building (2025_11_06_ゼミ発表.md:27-37).
"""

from typing import NamedTuple

import numpy as np

_C0 = 0.28209479177387814  # SH DC basis factor (ops/sh)


class SyntheticCapture(NamedTuple):
    gt_model: object  # GaussianModel — the renderable ground truth
    P: np.ndarray  # (M, 3, 4) world->camera
    K: np.ndarray  # (M, 3, 3) intrinsics
    wh: np.ndarray  # (M, 2) image sizes
    sfm_xyz: np.ndarray  # (S, 3) noisy SfM-like init points
    sfm_rgb: np.ndarray  # (S, 3) uint8 point colors (COLMAP parity)


def _checker(x, z, period=1.0):
    return ((np.floor(x / period) + np.floor(z / period)) % 2).astype(np.float32)


def _courtyard_points(n_scale: float, rng, point_scale_exp: float = 0.0):
    """Structured point soup: (xyz, rgb in [0,1], scale). y is up.

    point_scale_exp: shrink per-point gaussian size as the count grows —
    scale *= n_scale ** (-point_scale_exp). At 0.5 the inter-point spacing
    on a surface (~n^-1/2) and the point size shrink together, so a larger
    n_scale means FINER texture at constant coverage instead of more
    overlap; the round-4 oracle-GT quality run uses this to give the scene
    real-photo-like high-frequency detail that drives densification toward
    the reference's ~514k end state (opacity.pt)."""
    size_mul = float(n_scale) ** (-point_scale_exp) if n_scale > 0 else 1.0
    pts, cols, scl = [], [], []

    def add(p, c, s):
        pts.append(p.astype(np.float32))
        cols.append(c.astype(np.float32))
        scl.append(np.full(len(p), s * size_mul, np.float32))

    # ground plane [-10, 10]^2 at y=0: checker + grass noise
    ng = int(14000 * n_scale)
    gx = rng.uniform(-10, 10, ng)
    gz = rng.uniform(-10, 10, ng)
    gy = rng.normal(0, 0.015, ng)
    ch = _checker(gx, gz, 2.0)
    base = np.stack(
        [0.35 + 0.25 * ch, 0.42 + 0.1 * ch, 0.28 + 0.05 * ch], 1
    )
    base += rng.normal(0, 0.06, base.shape)
    add(np.stack([gx, gy, gz], 1), base, 0.16)

    # building: box x[-4,4], y[0,5], z[2,5]; brick walls w/ window grid
    nb = int(20000 * n_scale)
    face = rng.integers(0, 5, nb)  # 4 walls + roof
    u = rng.uniform(0, 1, nb)
    v = rng.uniform(0, 1, nb)
    bx = np.where(face == 0, -4, np.where(face == 1, 4, u * 8 - 4))
    bz = np.where(face == 2, 2, np.where(face == 3, 5, u * 3 + 2))
    bz = np.where(face < 2, u * 3 + 2, bz)
    by = np.where(face == 4, 5.0, v * 5)
    # window pattern on walls: dark rectangles every 1.6 m
    wx = np.where(face < 2, bz, bx)
    win = (
        (np.abs((wx % 1.6) - 0.8) < 0.45)
        & (np.abs((by % 1.8) - 1.0) < 0.5)
        & (face < 4)
    )
    brick = np.stack(
        [
            0.62 + rng.normal(0, 0.05, nb),
            0.42 + rng.normal(0, 0.04, nb),
            0.32 + rng.normal(0, 0.04, nb),
        ],
        1,
    )
    glass = np.array([0.15, 0.2, 0.3])[None]
    col = np.where(win[:, None], glass + rng.normal(0, 0.02, (nb, 3)), brick)
    col = np.where(face[:, None] == 4, [[0.5, 0.18, 0.15]], col)  # roof
    add(np.stack([bx, by, bz], 1), col, 0.09)

    # tower: cylinder r=1.2 at (-6, *, -4), h=7, striped
    nt = int(8000 * n_scale)
    th = rng.uniform(0, 2 * np.pi, nt)
    ty = rng.uniform(0, 7, nt)
    tx = -6 + 1.2 * np.cos(th)
    tz = -4 + 1.2 * np.sin(th)
    stripe = ((ty * 1.5).astype(int) % 2).astype(np.float32)
    col = np.stack(
        [0.75 - 0.3 * stripe, 0.7 - 0.25 * stripe, 0.65 + 0.1 * stripe], 1
    ) + rng.normal(0, 0.03, (nt, 3))
    add(np.stack([tx, ty, tz], 1), col, 0.08)

    # trees: fuzzy spheres
    centers = rng.uniform(-8, 8, (9, 3))
    centers[:, 1] = rng.uniform(1.0, 1.8, 9)
    centers[:, 2] = np.where(
        np.abs(centers[:, 2]) < 6, centers[:, 2] - 7, centers[:, 2]
    )
    for c in centers:
        nl = int(1800 * n_scale)
        d = rng.normal(0, 1, (nl, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
        r = rng.uniform(0.5, 1.0, nl) ** 0.5 * 1.1
        p = c[None] + d * r[:, None]
        leaf = np.stack(
            [
                0.12 + rng.normal(0, 0.05, nl),
                0.4 + rng.normal(0, 0.1, nl),
                0.1 + rng.normal(0, 0.04, nl),
            ],
            1,
        )
        add(p, leaf, 0.1)

    xyz = np.concatenate(pts)
    rgb = np.clip(np.concatenate(cols), 0.02, 0.98)
    scale = np.concatenate(scl)
    return xyz, rgb, scale


def _look_at(pos, target, up=(0.0, 1.0, 0.0)):
    """World->camera [R | t] with +z forward (positive depth)."""
    pos = np.asarray(pos, np.float64)
    f = np.asarray(target, np.float64) - pos
    f /= np.linalg.norm(f)
    r = np.cross(np.asarray(up, np.float64), f)
    r /= np.linalg.norm(r)
    d = np.cross(f, r)  # completes the right-handed basis (image y)
    R = np.stack([r, d, f]).astype(np.float32)
    t = (-R @ pos.astype(np.float32)).astype(np.float32)
    return np.concatenate([R, t[:, None]], 1)


def make_courtyard_capture(
    n_cams: int = 100,
    width: int = 400,
    height: int = 266,
    gt_points_scale: float = 1.0,
    sfm_points: int = 25000,
    sfm_noise: float = 0.03,
    seed: int = 0,
    sh_degree: int = 2,
    view_dep: float = 0.15,
    point_scale_exp: float = 0.0,
) -> SyntheticCapture:
    """Build the courtyard capture.

    gt_points_scale scales the GT gaussian count (~58k at 1.0);
    point_scale_exp > 0 shrinks point sizes as the count grows (finer
    texture instead of more overlap — see _courtyard_points).
    view_dep adds small random degree-1 SH coefficients (view-dependent
    shading, so the trainer must fit more than a diffuse field).
    Image size default mirrors the reference bundle (100 JPGs resized to
    width 400, image_resize.bat:6-8; south-building aspect ~3:2).
    """
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points

    rng = np.random.default_rng(seed)
    xyz, rgb, scale = _courtyard_points(
        gt_points_scale, rng, point_scale_exp=point_scale_exp
    )
    n = len(xyz)

    gt = init_from_points(xyz, scale, opacity_init=0.9, sh_degree=sh_degree)
    sh = np.array(gt.sh)  # (3 * n_basis, cap) packed component-major
    sh[0:3, :n] = (rgb / _C0).T
    nb = (sh_degree + 1) ** 2
    if view_dep > 0:
        for b in range(1, min(4, nb)):  # degree-1 bands
            sh[3 * b : 3 * b + 3, :n] = rng.normal(0, view_dep, (3, n))
    gt = gt._replace(sh=jnp.asarray(sh))

    # camera ring: two heights, jittered radius, all looking at the court
    Ps, Ks = [], []
    f = 0.75 * width  # ~67 deg horizontal FOV
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams + rng.normal(0, 0.01)
        ring = i % 2
        rad = (13.0 if ring == 0 else 15.5) + rng.normal(0, 0.3)
        h = (2.2 if ring == 0 else 4.5) + rng.normal(0, 0.2)
        pos = np.array([rad * np.cos(ang), h, rad * np.sin(ang)])
        target = np.array([0.0, 1.6, 0.0])
        Ps.append(_look_at(pos, target))
        Ks.append(
            np.array(
                [[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32
            )
        )

    # SfM-like init: subsample GT surface points + noise (structure is
    # discovered; fine detail must come from densify, reference
    # gs_control.py:111-118 inits from COLMAP points3D)
    pick = rng.choice(n, size=min(sfm_points, n), replace=False)
    sfm = xyz[pick] + rng.normal(0, sfm_noise, (len(pick), 3)).astype(
        np.float32
    )
    sfm_rgb = (np.clip(rgb[pick], 0, 1) * 255).astype(np.uint8)

    return SyntheticCapture(
        gt_model=gt,
        P=np.stack(Ps),
        K=np.stack(Ks),
        wh=np.tile([[width, height]], (n_cams, 1)).astype(np.int32),
        sfm_xyz=sfm.astype(np.float32),
        sfm_rgb=sfm_rgb,
    )


def render_capture_images(
    capture: SyntheticCapture, render_cfg, batch: int = 10
) -> np.ndarray:
    """Render the GT images for every camera. (M, H, W, 3) float32."""
    import jax
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.render import render_params

    W, H = int(capture.wh[0, 0]), int(capture.wh[0, 1])
    params = capture.gt_model.trainable()
    alive = capture.gt_model.alive

    @jax.jit
    def go(P, K):
        img, _ = render_params(params, alive, P, K, (W, H), render_cfg)
        return img

    out = []
    M = len(capture.P)
    for i in range(0, M, batch):
        j = min(i + batch, M)
        # pad the tail chunk to the compiled batch size
        P = capture.P[i:j]
        K = capture.K[i:j]
        if j - i < batch:
            pad = batch - (j - i)
            P = np.concatenate([P, np.repeat(P[-1:], pad, 0)])
            K = np.concatenate([K, np.repeat(K[-1:], pad, 0)])
        img = go(jnp.asarray(P), jnp.asarray(K))
        out.append(np.asarray(img[: j - i]))
    return np.concatenate(out)
