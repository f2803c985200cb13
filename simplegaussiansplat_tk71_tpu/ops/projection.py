"""Project 3D Gaussians into a camera's pixel space.

Re-implements the forward projection pipeline of the reference
(gs_model.py:277-365) as a single fused jnp function:

  world -> camera (P), camera -> pixel (K, z clamp 1e-2),
  Sigma3D = R S S^T R^T, Sigma_cam = W Sigma W^T, Sigma_pix = J Sigma_cam J^T
  + 1e-6 I, conic = closed-form 2x2 inverse, 3-sigma boxes, SH colors,
  frustum/extent culling.

Differences from the reference, by TPU design (see SURVEY.md section 7.1):
- No CPU eigh round trip: boxes come from sqrt(diag(Sigma_pix)) in closed form.
- Pixel means stay float32 (the reference truncates to int32 at
  gs_model.py:361; the int snap loses sub-pixel gradients). Parity tests cover
  the shared math; the default path uses the un-snapped means.
- Everything is one jit-traceable function over (M cameras, N gaussians); no
  per-image python loop (reference gs_model.py:402-451).
- Component-major layouts end to end: parameters arrive as (C, N) columns and
  every output is (M, C, N) — an (N, few) f32 buffer pads its minor dim to
  the TPU's 128-lane tile (14-42x memory and elementwise traffic, NOTES.md
  layout tax), while component rows are dense.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.ops import transforms


class ProjectedGaussians(NamedTuple):
    """Per-(camera, gaussian) screen-space attributes, component-major."""

    mean2d: jnp.ndarray  # (M, 2, N) pixel-space means
    conic: jnp.ndarray  # (M, 3, N) upper-tri of inverse 2D covariance (a, b, c)
    depth: jnp.ndarray  # (M, N) camera-space z
    color: jnp.ndarray  # (M, 3, N) SH-evaluated radiance
    opacity: jnp.ndarray  # (M, N) sigmoid(logit_opacity)
    bbox_half: jnp.ndarray  # (M, 2, N) 3-sigma half extents (w, h), pixels
    valid: jnp.ndarray  # (M, N) bool: in front of camera & intersects screen


# Real SH constants (standard normalization used across 3DGS implementations).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def _sh_channels(deg, sh, xx, yy, zz):
    """SH radiance per channel from column-major coefficients.

    sh: (B*3, N) packed basis-major; xx/yy/zz: (M, N) unit view-direction
    components. Returns 3 (M, N) channels. Same math as ops/sh.eval_sh
    (reference gs_model.py:335-338 via the de-facto INRIA eval_sh).
    """
    assert 0 <= deg <= 3

    def coef(b, c):
        return sh[3 * b + c][None]  # (1, N)

    out = []
    for c in range(3):
        r = _C0 * coef(0, c)
        if deg >= 1:
            r = r - _C1 * yy * coef(1, c) + _C1 * zz * coef(2, c) - _C1 * xx * coef(3, c)
            if deg >= 2:
                xy, yz, xz = xx * yy, yy * zz, xx * zz
                x2, y2, z2 = xx * xx, yy * yy, zz * zz
                r = (
                    r
                    + _C2[0] * xy * coef(4, c)
                    + _C2[1] * yz * coef(5, c)
                    + _C2[2] * (2.0 * z2 - x2 - y2) * coef(6, c)
                    + _C2[3] * xz * coef(7, c)
                    + _C2[4] * (x2 - y2) * coef(8, c)
                )
                if deg >= 3:
                    r = (
                        r
                        + _C3[0] * yy * (3.0 * x2 - y2) * coef(9, c)
                        + _C3[1] * xy * zz * coef(10, c)
                        + _C3[2] * yy * (4.0 * z2 - x2 - y2) * coef(11, c)
                        + _C3[3] * zz * (2.0 * z2 - 3.0 * x2 - 3.0 * y2) * coef(12, c)
                        + _C3[4] * xx * (4.0 * z2 - x2 - y2) * coef(13, c)
                        + _C3[5] * zz * (x2 - y2) * coef(14, c)
                        + _C3[6] * xx * (x2 - 3.0 * y2) * coef(15, c)
                    )
        out.append(r)
    return out


def project(
    mean: jnp.ndarray,
    quat: jnp.ndarray,
    log_scale: jnp.ndarray,
    logit_opacity: jnp.ndarray,
    sh: jnp.ndarray,
    P: jnp.ndarray,
    K: jnp.ndarray,
    img_wh,
    sh_degree: int = 2,
    z_min: float = 1e-2,
    bbox_max_frac: float = 0.4,
    alive: jnp.ndarray | None = None,
    snap_mean_to_int: bool = False,
) -> ProjectedGaussians:
    """Project N gaussians into M cameras.

    Args:
      mean: (3, N) world positions, component-major.
      quat: (4, N) xyzw rotations.
      log_scale: (3, N) log scales.
      logit_opacity: (N,) logit opacities.
      sh: (B * 3, N) packed SH coefficients (basis-major, channel-minor rows),
        B = (sh_degree+1)^2.
      P: (M, 3, 4) world->camera extrinsics.
      K: (M, 3, 3) intrinsics.
      img_wh: (width, height) static python ints.
      bbox_max_frac: boxes are clamped to bbox_max_frac * sqrt(W*H); the
        reference clamps to 10*sqrt(WH)*sigmoid(logit(0.04)) = 0.4*sqrt(WH)
        (gs_model.py:364-365 with the default tile_max_width=0.04,
        gs_control.py:39).
      alive: optional (N,) bool mask for capacity-padded parameter buffers;
        dead rows are marked invalid.

    Returns ProjectedGaussians, component-major with leading dim M.
    """
    width, height = int(img_wh[0]), int(img_wh[1])
    M = P.shape[0]
    N = mean.shape[1]

    # All the tiny per-gaussian linear algebra below is written as explicit
    # (M, 1) x (1, N) broadcast arithmetic: batched 3x3 einsums lower to
    # degenerate batched matmuls on TPU (measured ~4x slower than the
    # expansion at N=1M).

    # --- world -> camera (gs_model.py:289-290) ---
    R_wc = P[:, :, :3]  # (M, 3, 3)
    t_wc = P[:, :, 3]  # (M, 3)
    w = lambda i, j: R_wc[:, i, j][:, None]  # (M, 1)
    mx, my, mz = mean[0][None], mean[1][None], mean[2][None]  # (1, N)
    cam_x = w(0, 0) * mx + w(0, 1) * my + w(0, 2) * mz + t_wc[:, 0][:, None]
    cam_y = w(1, 0) * mx + w(1, 1) * my + w(1, 2) * mz + t_wc[:, 1][:, None]
    cam_z = w(2, 0) * mx + w(2, 1) * my + w(2, 2) * mz + t_wc[:, 2][:, None]
    z = cam_z

    # --- camera -> pixel (gs_model.py:293-294) ---
    k = lambda i, j: K[:, i, j][:, None]
    hx = k(0, 0) * cam_x + k(0, 1) * cam_y + k(0, 2) * cam_z
    hy = k(1, 0) * cam_x + k(1, 1) * cam_y + k(1, 2) * cam_z
    hz = k(2, 0) * cam_x + k(2, 1) * cam_y + k(2, 2) * cam_z
    inv_hz = 1.0 / jnp.maximum(hz, z_min)
    px = hx * inv_hz
    py = hy * inv_hz
    if snap_mean_to_int:
        # Reference parity: pixel means truncated to int32 (gs_model.py:361).
        # In the reference the int cast BREAKS the autograd chain, so position
        # gradients flow only through the covariance/color paths — we
        # reproduce that with stop_gradient. Off by default (the float path
        # keeps sub-pixel position gradients and is strictly better).
        px = jax.lax.stop_gradient(jnp.trunc(px))
        py = jax.lax.stop_gradient(jnp.trunc(py))
    mean2d = jnp.stack([px, py], axis=1)  # (M, 2, N)

    # --- 3D covariance (gs_model.py:297-307), 6 unique components (1, N) ---
    s3 = transforms.covariance_sym6_from_quat_scale_cols(quat, log_scale)
    s3 = {key: val[None] for key, val in zip(
        ["00", "01", "02", "11", "12", "22"], s3
    )}

    # --- camera-frame covariance Sigma_cam = W Sigma W^T (gs_model.py:309),
    # expanded: v_b = Sigma @ W_b^T (rows), c_ab = W_a . v_b ---
    def sig_comp(j, kk):  # Sigma_{j,kk} with j <= kk handled by symmetry
        a, b = (j, kk) if j <= kk else (kk, j)
        return s3[f"{a}{b}"]

    def v(j, b):  # (Sigma W^T)_{j,b} = sum_k Sigma_jk W_bk
        return (
            sig_comp(j, 0) * w(b, 0)
            + sig_comp(j, 1) * w(b, 1)
            + sig_comp(j, 2) * w(b, 2)
        )

    def c_ab(a, b):  # (W Sigma W^T)_{a,b}
        return w(a, 0) * v(0, b) + w(a, 1) * v(1, b) + w(a, 2) * v(2, b)

    c00 = c_ab(0, 0)
    c01 = c_ab(0, 1)
    c02 = c_ab(0, 2)
    c11 = c_ab(1, 1)
    c12 = c_ab(1, 2)
    c22 = c_ab(2, 2)

    # --- projective Jacobian & 2D covariance (gs_model.py:311-321) ---
    fx = K[:, 0, 0][:, None]
    fy = K[:, 1, 1][:, None]
    zc = jnp.maximum(z, z_min)
    inv_z = 1.0 / zc
    j00 = fx * inv_z
    j02 = -fx * cam_x * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * cam_y * inv_z * inv_z
    eps_diag = 1e-6
    s00 = j00 * j00 * c00 + 2.0 * j00 * j02 * c02 + j02 * j02 * c22 + eps_diag
    s01 = j00 * j11 * c01 + j00 * j12 * c02 + j02 * j11 * c12 + j02 * j12 * c22
    s11 = j11 * j11 * c11 + 2.0 * j11 * j12 * c12 + j12 * j12 * c22 + eps_diag

    # --- conic (closed-form 2x2 inverse, gs_model.py:353; det + 1e-6 as in
    # uitility.py:431-463) ---
    det = s00 * s11 - s01 * s01 + 1e-6
    inv_det = 1.0 / det
    conic = jnp.stack(
        [s11 * inv_det, -s01 * inv_det, s00 * inv_det], axis=1
    )  # (M, 3, N)

    # --- 3-sigma boxes, clamped (gs_model.py:332,364-365): sqrt(diag) in
    # closed form replaces the reference's CPU eigh round trip ---
    bbox_cap = bbox_max_frac * jnp.sqrt(float(width * height))
    bw = jnp.minimum(3.0 * jnp.sqrt(jnp.abs(s00)), bbox_cap)
    bh = jnp.minimum(3.0 * jnp.sqrt(jnp.abs(s11)), bbox_cap)
    bbox_half = jnp.stack([bw, bh], axis=1)  # (M, 2, N)

    # --- SH color along -view direction (gs_model.py:335-338) ---
    # Safe normalize: rsqrt(|x|^2 + eps) keeps the gradient finite at x = 0
    # (dead capacity-padding rows can sit exactly at the camera center; a
    # clamped norm has a NaN vjp there).
    norm_sq = cam_x * cam_x + cam_y * cam_y + cam_z * cam_z
    inv_norm = jax.lax.rsqrt(norm_sq + 1e-12)
    xx = -cam_x * inv_norm
    yy = -cam_y * inv_norm
    zz = -cam_z * inv_norm
    color = jnp.stack(_sh_channels(sh_degree, sh, xx, yy, zz), axis=1)

    # --- opacity ---
    opacity = jnp.broadcast_to(
        1.0 / (1.0 + jnp.exp(-logit_opacity.reshape(-1)))[None, :], (M, N)
    )

    # --- culling (gs_model.py:405-406): z > 0 and box intersects screen ---
    valid = (
        (z > 0)
        & (px - bw < width)
        & (px + bw > 0)
        & (py - bh < height)
        & (py + bh > 0)
        & (bw > 0)
    )
    if alive is not None:
        valid = valid & alive[None, :]

    return ProjectedGaussians(
        mean2d=mean2d,
        conic=conic,
        depth=z,
        color=color,
        opacity=opacity,
        bbox_half=bbox_half,
        valid=valid,
    )
