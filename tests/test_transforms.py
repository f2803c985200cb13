import numpy as np
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.ops import transforms

from oracle import quat_to_rotmat as quat_to_rotmat_np


def test_quat_to_rotmat_matches_oracle_and_is_rotation():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q)))
    R_ref = quat_to_rotmat_np(q.astype(np.float64))
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    # orthonormal, det +1
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_identity_quat():
    R = np.asarray(transforms.quat_to_rotmat(jnp.array([[0.0, 0, 0, 1]])))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-7)


def test_covariance_psd_and_matches_construction():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    ls = rng.normal(size=(32, 3)).astype(np.float32) * 0.5
    sigma = np.asarray(
        transforms.covariance_from_quat_scale(jnp.asarray(q), jnp.asarray(ls))
    )
    # manual: R diag(exp(2 ls)) R^T
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    R = quat_to_rotmat_np(qn.astype(np.float64))
    ref = np.einsum("nij,nj,nkj->nik", R, np.exp(2 * ls), R)
    np.testing.assert_allclose(sigma, ref, rtol=1e-4, atol=1e-5)
    eigs = np.linalg.eigvalsh(sigma)
    assert (eigs > -1e-5).all()


def test_invert_2x2_matches_numpy():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(100, 2, 2))
    # make well-conditioned symmetric PD
    A = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(2)
    inv = np.asarray(transforms.invert_2x2(jnp.asarray(A, dtype=jnp.float32)))
    ref = np.linalg.inv(A + 0)  # eps=1e-6 negligible for these det ~ O(1)
    np.testing.assert_allclose(inv, ref, rtol=1e-3, atol=1e-4)


def test_eigvals_2x2_sym():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(100, 2, 2))
    A = A + A.transpose(0, 2, 1)
    lam = np.asarray(transforms.eigvals_2x2_sym(jnp.asarray(A, dtype=jnp.float32)))
    ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(lam, ref, rtol=1e-4, atol=1e-4)


def test_bbox_half_extents_equals_eigvec_formula():
    """The closed form 3*sqrt(diag) equals the reference's 3*sqrt(V^2 @ |lam|)."""
    rng = np.random.default_rng(4)
    A = rng.normal(size=(50, 2, 2))
    A = A @ A.transpose(0, 2, 1) + 1e-3 * np.eye(2)  # PSD like Sigma_pix+eps I
    lam, V = np.linalg.eigh(A)
    ref_box = 3 * np.sqrt(np.einsum("nij,nj->ni", V**2, np.abs(lam)))
    box = np.asarray(
        transforms.sigma_bbox_half_extents(jnp.asarray(A, dtype=jnp.float32))
    )
    np.testing.assert_allclose(box, ref_box, rtol=1e-4, atol=1e-5)
