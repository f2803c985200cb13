import numpy as np
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.ops import projection

from oracle import project_oracle, quat_to_rotmat


def _random_cam(rng, W=64, H=48):
    # camera at random position looking roughly at origin
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = quat_to_rotmat(np.array([q[0], q[1], q[2], q[3]]))
    t = rng.normal(size=3) * 0.1
    P = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)
    f = 60.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return P, K


def test_projection_matches_oracle():
    rng = np.random.default_rng(0)
    n = 200
    mean = rng.normal(size=(n, 3)).astype(np.float32)
    mean[:, 2] += 5.0  # mostly in front
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    log_scale = (rng.normal(size=(n, 3)) * 0.3 - 2.0).astype(np.float32)
    logit_op = rng.normal(size=(n,)).astype(np.float32)
    sh = rng.normal(size=(27, n)).astype(np.float32) * 0.3
    P, K = _random_cam(rng)
    W, H = 64, 48

    # project() consumes component-major (C, N) parameters
    proj = projection.project(
        jnp.asarray(mean.T), jnp.asarray(quat.T), jnp.asarray(log_scale.T),
        jnp.asarray(logit_op), jnp.asarray(sh),
        jnp.asarray(P)[None], jnp.asarray(K)[None], (W, H),
    )
    ref = project_oracle(
        mean.astype(np.float64), quat.astype(np.float64),
        log_scale.astype(np.float64), P.astype(np.float64), K.astype(np.float64),
    )
    np.testing.assert_allclose(
        np.asarray(proj.depth[0]), ref["depth"], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(proj.mean2d[0]).T, ref["mean2d"], rtol=1e-3, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(proj.conic[0]).T, ref["conic"], rtol=2e-3, atol=1e-3
    )
    # opacity
    np.testing.assert_allclose(
        np.asarray(proj.opacity[0]),
        1 / (1 + np.exp(-logit_op)),
        rtol=1e-5,
    )
    # bbox from sigma2d diag
    ref_box = 3 * np.sqrt(np.abs(np.stack(
        [ref["sigma2d"][:, 0, 0], ref["sigma2d"][:, 1, 1]], -1
    )))
    ref_box = np.minimum(ref_box, 0.4 * np.sqrt(W * H))
    np.testing.assert_allclose(
        np.asarray(proj.bbox_half[0]).T, ref_box, rtol=2e-3, atol=1e-3
    )


def test_behind_camera_culled():
    mean = jnp.array([[0.0, 0.0, -5.0], [0.0, 0.0, 5.0]]).T
    quat = jnp.tile(jnp.array([[0.0, 0, 0, 1]]), (2, 1)).T
    ls = jnp.full((3, 2), -1.0)
    lo = jnp.zeros((2,))
    sh = jnp.zeros((27, 2))
    P = jnp.eye(3, 4)[None]
    K = jnp.asarray([[[50.0, 0, 32], [0, 50, 32], [0, 0, 1]]])
    proj = projection.project(mean, quat, ls, lo, sh, P, K, (64, 64))
    assert not bool(proj.valid[0, 0])
    assert bool(proj.valid[0, 1])


def test_alive_mask_respected():
    mean = jnp.tile(jnp.array([[0.0], [0.0], [5.0]]), (1, 3))
    quat = jnp.tile(jnp.array([[0.0], [0], [0], [1]]), (1, 3))
    ls = jnp.full((3, 3), -1.0)
    lo = jnp.zeros((3,))
    sh = jnp.zeros((27, 3))
    P = jnp.eye(3, 4)[None]
    K = jnp.asarray([[[50.0, 0, 32], [0, 50, 32], [0, 0, 1]]])
    alive = jnp.array([True, False, True])
    proj = projection.project(mean, quat, ls, lo, sh, P, K, (64, 64), alive=alive)
    assert list(np.asarray(proj.valid[0])) == [True, False, True]
