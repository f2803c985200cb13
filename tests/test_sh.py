import numpy as np
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.ops.sh import eval_sh, num_sh_bases


def _basis_matrix(deg, dirs):
    """Evaluate each basis function by one-hot coefficient probing."""
    nb = num_sh_bases(deg)
    out = np.zeros((len(dirs), nb))
    for i in range(nb):
        sh = np.zeros((1, 1, nb), np.float32)
        sh[0, 0, i] = 1.0
        vals = np.asarray(
            eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs, dtype=jnp.float32))
        )
        out[:, i] = vals[:, 0]
    return out


def test_sh_orthonormality_monte_carlo():
    """Real SH bases are orthonormal over the sphere: MC check of the constants."""
    rng = np.random.default_rng(0)
    d = rng.normal(size=(200_000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Y = _basis_matrix(3, d)
    gram = 4 * np.pi * (Y.T @ Y) / len(d)
    np.testing.assert_allclose(gram, np.eye(Y.shape[1]), atol=0.05)


def test_sh_degree0_constant():
    d = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    Y = _basis_matrix(0, d)
    np.testing.assert_allclose(Y[:, 0], 0.28209479, rtol=1e-6)


def test_sh_degree1_linear_in_direction():
    # basis 1,2,3 proportional to (-y, z, -x) with C1 = 0.4886025
    d = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    Y = _basis_matrix(1, d)
    np.testing.assert_allclose(Y[0, 1], -0.4886025, rtol=1e-5)
    np.testing.assert_allclose(Y[1, 2], 0.4886025, rtol=1e-5)
    np.testing.assert_allclose(Y[2, 3], -0.4886025, rtol=1e-5)


def test_reference_c00_init_gives_half_gray():
    """Reference inits c00=1.77 (gs_model.py:156-157): base color ~0.4993."""
    sh = np.zeros((1, 3, 9), np.float32)
    sh[:, :, 0] = 1.77
    col = np.asarray(eval_sh(2, jnp.asarray(sh), jnp.asarray([[0.0, 0, 1]])))
    np.testing.assert_allclose(col, 1.77 * 0.28209479, rtol=1e-5)
