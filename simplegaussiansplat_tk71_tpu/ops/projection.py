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
from simplegaussiansplat_tk71_tpu.ops.sh import eval_sh


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
      sh: (N, B, 3) SH coefficients, B = (sh_degree+1)^2.
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

    # --- world -> camera (gs_model.py:289-290) ---
    R_wc = P[:, :, :3]  # (M, 3, 3)
    t_wc = P[:, :, 3]  # (M, 3)
    mean_cam = jnp.einsum("mij,nj->mni", R_wc, mean, precision="highest") + t_wc[:, None, :]
    z = mean_cam[..., 2]

    # --- camera -> pixel (gs_model.py:293-294) ---
    mean_pix_homo = jnp.einsum("mij,mnj->mni", K, mean_cam, precision="highest")
    z_clamped = jnp.maximum(mean_pix_homo[..., 2], z_min)
    mean2d = mean_pix_homo[..., :2] / z_clamped[..., None]
    if snap_mean_to_int:
        # Reference parity: pixel means truncated to int32 (gs_model.py:361).
        # In the reference the int cast BREAKS the autograd chain, so position
        # gradients flow only through the covariance/color paths — we
        # reproduce that with stop_gradient. Off by default (the float path
        # keeps sub-pixel position gradients and is strictly better).
        mean2d = jax.lax.stop_gradient(jnp.trunc(mean2d))

    # --- 3D covariance (gs_model.py:297-307) ---
    sigma3d = transforms.covariance_from_quat_scale(quat, log_scale)  # (N, 3, 3)

    # --- camera-frame covariance Sigma_cam = W Sigma W^T (gs_model.py:309) ---
    sigma_cam = jnp.einsum("mij,njk,mlk->mnil", R_wc, sigma3d, R_wc, precision="highest")

    # --- projective Jacobian & 2D covariance (gs_model.py:311-321) ---
    j00, j02, j11, j12 = transforms.pixel_jacobian(K, mean_cam, z_min)
    sigma2d = transforms.project_covariance_2d(sigma_cam, j00, j02, j11, j12)

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
    sh_mc = jnp.swapaxes(sh, -1, -2)[None]  # (1, N, 3, B); broadcasts over M
    color = eval_sh(sh_degree, sh_mc, view_dir)  # (M, N, 3)

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
