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
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.ops import transforms
from simplegaussiansplat_tk71_tpu.ops.sh import eval_sh_packed


class ProjectedGaussians(NamedTuple):
    """Per-(camera, gaussian) screen-space attributes; leading dims (M, N)."""

    mean2d: jnp.ndarray  # (M, N, 2) pixel-space means
    conic: jnp.ndarray  # (M, N, 3) upper-tri of inverse 2D covariance (a, b, c)
    depth: jnp.ndarray  # (M, N) camera-space z
    color: jnp.ndarray  # (M, N, 3) SH-evaluated radiance
    opacity: jnp.ndarray  # (M, N) sigmoid(logit_opacity)
    bbox_half: jnp.ndarray  # (M, N, 2) 3-sigma half extents (w, h), pixels
    valid: jnp.ndarray  # (M, N) bool: in front of camera & intersects screen


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
      mean: (N, 3) world positions.
      quat: (N, 4) xyzw rotations.
      log_scale: (N, 3) log scales.
      logit_opacity: (N, 1) or (N,) logit opacities.
      sh: (N, B * 3) packed SH coefficients (basis-major, channel-minor),
        B = (sh_degree+1)^2; a 3-D (N, B, 3) tensor is accepted and
        flattened (but prefer 2-D — see eval_sh_packed on TPU tile padding).
      P: (M, 3, 4) world->camera extrinsics.
      K: (M, 3, 3) intrinsics.
      img_wh: (width, height) static python ints.
      bbox_max_frac: boxes are clamped to bbox_max_frac * sqrt(W*H); the
        reference clamps to 10*sqrt(WH)*sigmoid(logit(0.04)) = 0.4*sqrt(WH)
        (gs_model.py:364-365 with the default tile_max_width=0.04,
        gs_control.py:39).
      alive: optional (N,) bool mask for capacity-padded parameter buffers;
        dead rows are marked invalid.

    Returns ProjectedGaussians with leading shape (M, N).
    """
    width, height = int(img_wh[0]), int(img_wh[1])
    M = P.shape[0]

    # All the tiny per-gaussian linear algebra below is written as explicit
    # (M, 1) x (1, N) broadcast arithmetic: batched 3x3 einsums lower to
    # degenerate batched matmuls on TPU (measured ~4x slower than the
    # expansion at N=1M).

    # --- world -> camera (gs_model.py:289-290) ---
    R_wc = P[:, :, :3]  # (M, 3, 3)
    t_wc = P[:, :, 3]  # (M, 3)
    w = lambda i, j: R_wc[:, i, j][:, None]  # (M, 1)
    mx, my, mz = mean[:, 0][None], mean[:, 1][None], mean[:, 2][None]  # (1, N)
    cam_x = w(0, 0) * mx + w(0, 1) * my + w(0, 2) * mz + t_wc[:, 0][:, None]
    cam_y = w(1, 0) * mx + w(1, 1) * my + w(1, 2) * mz + t_wc[:, 1][:, None]
    cam_z = w(2, 0) * mx + w(2, 1) * my + w(2, 2) * mz + t_wc[:, 2][:, None]
    mean_cam = jnp.stack([cam_x, cam_y, cam_z], axis=-1)  # (M, N, 3)
    z = cam_z

    # --- camera -> pixel (gs_model.py:293-294) ---
    k = lambda i, j: K[:, i, j][:, None]
    hx = k(0, 0) * cam_x + k(0, 1) * cam_y + k(0, 2) * cam_z
    hy = k(1, 0) * cam_x + k(1, 1) * cam_y + k(1, 2) * cam_z
    hz = k(2, 0) * cam_x + k(2, 1) * cam_y + k(2, 2) * cam_z
    inv_hz = 1.0 / jnp.maximum(hz, z_min)
    mean2d = jnp.stack([hx * inv_hz, hy * inv_hz], axis=-1)
    if snap_mean_to_int:
        # Reference parity: pixel means truncated to int32 (gs_model.py:361).
        # In the reference the int cast BREAKS the autograd chain, so position
        # gradients flow only through the covariance/color paths — we
        # reproduce that with stop_gradient. Off by default (the float path
        # keeps sub-pixel position gradients and is strictly better).
        mean2d = jax.lax.stop_gradient(jnp.trunc(mean2d))

    # --- 3D covariance (gs_model.py:297-307), 6 unique components (1, N) ---
    s3 = transforms.covariance_sym6_from_quat_scale(quat, log_scale)
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
    row0 = jnp.stack([s00, s01], axis=-1)
    row1 = jnp.stack([s01, s11], axis=-1)
    sigma2d = jnp.stack([row0, row1], axis=-2)

    # --- conic (inverse 2D covariance, gs_model.py:353) ---
    inv = transforms.invert_2x2(sigma2d)
    conic = jnp.stack([inv[..., 0, 0], inv[..., 0, 1], inv[..., 1, 1]], axis=-1)

    # --- 3-sigma boxes, clamped (gs_model.py:332,364-365) ---
    bbox_half = transforms.sigma_bbox_half_extents(sigma2d)
    bbox_cap = bbox_max_frac * jnp.sqrt(float(width * height))
    bbox_half = jnp.minimum(bbox_half, bbox_cap)

    # --- SH color along -view direction (gs_model.py:335-338) ---
    # Safe normalize: rsqrt(|x|^2 + eps) keeps the gradient finite at x = 0
    # (dead capacity-padding rows can sit exactly at the camera center; a
    # clamped norm has a NaN vjp there).
    norm_sq = jnp.sum(jnp.square(mean_cam), axis=-1, keepdims=True)
    view_dir = -mean_cam * jax.lax.rsqrt(norm_sq + 1e-12)
    if sh.ndim == 3:
        # compat: callers should pass the packed 2-D layout — a materialized
        # (N, B, 3) tensor pads to the (8, 128) tile at 42-76x memory
        sh = sh.reshape(sh.shape[0], -1)
    color = eval_sh_packed(sh_degree, sh[None], view_dir)  # (M, N, 3)

    # --- opacity ---
    opacity = jnp.broadcast_to(
        1.0 / (1.0 + jnp.exp(-logit_opacity.reshape(-1)))[None, :], (M, mean.shape[0])
    )

    # --- culling (gs_model.py:405-406): z > 0 and box intersects screen ---
    x0 = mean2d[..., 0] - bbox_half[..., 0]
    x1 = mean2d[..., 0] + bbox_half[..., 0]
    y0 = mean2d[..., 1] - bbox_half[..., 1]
    y1 = mean2d[..., 1] + bbox_half[..., 1]
    valid = (
        (z > 0)
        & (x0 < width)
        & (x1 > 0)
        & (y0 < height)
        & (y1 > 0)
        & (bbox_half[..., 0] > 0)
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
