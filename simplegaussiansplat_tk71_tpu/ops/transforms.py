"""Batched geometric primitives for Gaussian projection.

All functions are pure jnp, shaped for XLA fusion on the VPU; the heavy lifting
(covariance sandwich products) is expressed with explicit component arithmetic
rather than tiny batched 3x3 matmuls so XLA lowers them to fused elementwise
vector code instead of degenerate MXU calls.

Reference parity notes (file:line cite /root/reference):
- quat_to_rotmat matches Utilities.qvec_to_rotmat_torch_batch (uitility.py:231-254),
  xyzw component order.
- covariance_from_quat_scale matches Sigma = R S S^T R^T (gs_model.py:297-307)
  with S = diag(exp(log_scale)).
- invert_2x2 matches the closed-form det+eps inverse (uitility.py:431-463).
- eigvals_2x2 replaces the reference's GPU->CPU->GPU torch.linalg.eigh round
  trip (gs_model.py:327-329) with the closed-form symmetric 2x2 solution.
"""

import jax
import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) xyzw quaternions -> (N, 3, 3) rotation matrices.

    Callers are expected to pass normalized quaternions (the reference
    normalizes with a 1e-8 clamp at gs_model.py:297).
    """
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def normalize_quat(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Unit-normalize with the reference's clamp (gs_model.py:297).

    Uses rsqrt(|q|^2 + eps^2) rather than /max(norm, eps): the clamped form
    has a NaN vjp at q = 0 (norm's gradient is 0/0 there), and dead
    capacity-padding rows can legitimately hold zero quaternions.
    """
    norm_sq = jnp.sum(jnp.square(q), axis=-1, keepdims=True)
    return q * jax.lax.rsqrt(norm_sq + eps * eps)


def covariance_from_quat_scale(q: jnp.ndarray, log_scale: jnp.ndarray) -> jnp.ndarray:
    """3D covariance Sigma = R diag(exp(2*log_scale)) R^T.

    q: (N, 4) xyzw (normalized inside), log_scale: (N, 3) -> (N, 3, 3).
    Matches gs_model.py:297-307 (R @ S @ S^T @ R^T with S=diag(exp(s))).
    """
    s00, s01, s02, s11, s12, s22 = covariance_sym6_from_quat_scale(q, log_scale)
    row0 = jnp.stack([s00, s01, s02], axis=-1)
    row1 = jnp.stack([s01, s11, s12], axis=-1)
    row2 = jnp.stack([s02, s12, s22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def covariance_sym6_from_quat_scale(q: jnp.ndarray, log_scale: jnp.ndarray):
    """Unique components (00, 01, 02, 11, 12, 22) of Sigma = R diag(s^2) R^T.

    Fully expanded scalar arithmetic: Sigma_ik = sum_j R_ij s2_j R_kj. Tiny
    batched 3x3 einsums lower to degenerate batched matmuls on TPU; the
    expansion keeps everything on the VPU.
    """
    rot = quat_to_rotmat(normalize_quat(q))
    s2 = jnp.exp(2.0 * log_scale)  # (N, 3)
    r = lambda i, j: rot[..., i, j]
    s = lambda j: s2[..., j]

    def sig(i, k):
        return (
            r(i, 0) * s(0) * r(k, 0)
            + r(i, 1) * s(1) * r(k, 1)
            + r(i, 2) * s(2) * r(k, 2)
        )

    return sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2)


def covariance_sym6_from_quat_scale_cols(q: jnp.ndarray, log_scale: jnp.ndarray):
    """covariance_sym6_from_quat_scale for column-major inputs.

    q: (4, N) xyzw, log_scale: (3, N) — the transposed parameter storage
    (NOTES.md layout tax: (N, few) buffers pad their lanes 14-42x on TPU;
    component rows are dense). Returns 6 (N,) components.
    """
    qn = normalize_quat(jnp.swapaxes(q, 0, 1))
    # the transpose + stack + slice chain fuses away: every consumer below
    # reads scalar (N,) components
    return covariance_sym6_from_quat_scale_pre(qn, jnp.swapaxes(log_scale, 0, 1))


def covariance_sym6_from_quat_scale_pre(qn: jnp.ndarray, log_scale: jnp.ndarray):
    """sym6 covariance from an already-normalized quaternion."""
    rot = quat_to_rotmat(qn)
    s2 = jnp.exp(2.0 * log_scale)  # (N, 3)
    r = lambda i, j: rot[..., i, j]
    s = lambda j: s2[..., j]

    def sig(i, k):
        return (
            r(i, 0) * s(0) * r(k, 0)
            + r(i, 1) * s(1) * r(k, 1)
            + r(i, 2) * s(2) * r(k, 2)
        )

    return sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2)


def invert_2x2(m: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Closed-form inverse of (..., 2, 2) with det regularized by +eps.

    Matches Utilities.invert_2x2_batch (uitility.py:431-463) including the
    det + eps stabilization (not abs-det: parity with the reference).
    """
    a = m[..., 0, 0]
    b = m[..., 0, 1]
    c = m[..., 1, 0]
    d = m[..., 1, 1]
    det = a * d - b * c + eps
    inv_det = 1.0 / det
    row0 = jnp.stack([d * inv_det, -b * inv_det], axis=-1)
    row1 = jnp.stack([-c * inv_det, a * inv_det], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def eigvals_2x2_sym(m: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric (..., 2, 2), ascending, closed form.

    lambda = mean +- sqrt(((a-d)/2)^2 + b^2). Replaces the reference's CPU
    eigh round trip (gs_model.py:327-329).
    """
    a = m[..., 0, 0]
    b = m[..., 0, 1]
    d = m[..., 1, 1]
    mean = 0.5 * (a + d)
    radius = jnp.sqrt(jnp.square(0.5 * (a - d)) + jnp.square(b))
    return jnp.stack([mean - radius, mean + radius], axis=-1)


def sigma_bbox_half_extents(sigma2d: jnp.ndarray, n_sigma: float = 3.0) -> jnp.ndarray:
    """Axis-aligned half extents of the n-sigma box of a 2D Gaussian.

    The reference computes 3*sqrt(V^2 @ |lambda|) from a full eigendecomposition
    (gs_model.py:327-332); for Sigma = V diag(lambda) V^T that expression is
    exactly sqrt of the diagonal of V diag(|lambda|) V^T, i.e. sqrt(diag(Sigma))
    when Sigma is PSD — the eigendecomposition is unnecessary. We keep the
    |lambda| robustness by reconstructing the diagonal through closed-form
    eigenpairs only when negative eigenvalues are possible; in practice
    Sigma + 1e-6 I is PSD, so we take |diag| directly.

    sigma2d: (..., 2, 2) -> (..., 2) half extents (width, height order).
    """
    diag = jnp.stack([sigma2d[..., 0, 0], sigma2d[..., 1, 1]], axis=-1)
    return n_sigma * jnp.sqrt(jnp.abs(diag))
