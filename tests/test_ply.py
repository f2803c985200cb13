"""PLY interchange (data/ply): official-3DGS layout round trip.

The export must be consumable by standard viewers: channel-major f_rest,
w-first quaternion, logit opacity / log scale, and the DC offset conversion
(this framework composites raw SH with no +0.5 — reference parity — while
viewers compute 0.5 + C0 * f_dc)."""

import numpy as np
import pytest

from simplegaussiansplat_tk71_tpu.data.ply import _DC_OFFSET, load_ply, save_ply
from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points


def _random_model(n=100, deg=2, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz[:, 2] += 5
    model = init_from_points(
        xyz, rng.uniform(0.01, 0.1, n).astype(np.float32), sh_degree=deg
    )
    nb = (deg + 1) ** 2
    sh = np.array(model.sh)
    sh[:, :n] = rng.normal(size=(nb * 3, n)).astype(np.float32)
    quat = rng.normal(size=(4, model.capacity)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=0, keepdims=True)
    return model._replace(sh=jnp.asarray(sh), quat=jnp.asarray(quat))


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_roundtrip_exact(tmp_path, deg):
    model = _random_model(n=64, deg=deg, seed=deg)
    path = str(tmp_path / "m.ply")
    n = save_ply(path, model)
    assert n == 64
    back = load_ply(path)
    assert back.sh_degree == deg
    assert int(back.num_alive()) == 64
    alive = np.asarray(model.alive)
    for name in ("mean", "quat", "log_scale", "sh"):
        a = np.asarray(getattr(model, name))[:, alive]
        b = np.asarray(getattr(back, name))[:, np.asarray(back.alive)]
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(model.logit_opacity)[alive],
        np.asarray(back.logit_opacity)[np.asarray(back.alive)],
        atol=1e-6,
    )


def test_viewer_dc_convention(tmp_path):
    """c00 = 1.77 (reference init) must export as f_dc = 1.77 - 0.5/C0, so a
    standard viewer's 0.5 + C0*f_dc reproduces this renderer's C0*c00."""
    model = _random_model(n=8, deg=0)
    sh = np.array(model.sh)
    sh[:] = 0.0
    sh[0:3, :8] = 1.77
    import jax.numpy as jnp

    model = model._replace(sh=jnp.asarray(sh))
    path = str(tmp_path / "m.ply")
    save_ply(path, model)
    with open(path, "rb") as f:
        while f.readline().strip() != b"end_header":
            pass
        row = np.frombuffer(f.read(4 * 17), dtype="<f4")  # deg-0 row: 17 floats
    f_dc = row[6:9]
    np.testing.assert_allclose(f_dc, 1.77 - _DC_OFFSET, atol=1e-6)
    # viewer color == our renderer's radiance + the 0.5 the viewer adds
    C0 = 0.28209479177387814
    np.testing.assert_allclose(0.5 + C0 * f_dc, C0 * 1.77, atol=1e-6)


def test_rest_is_channel_major(tmp_path):
    """f_rest_* must be channel-major (all band coeffs for R, then G, then
    B), matching the official exporter's transpose."""
    model = _random_model(n=4, deg=1)
    sh = np.array(model.sh)
    sh[:] = 0.0
    # basis-major packed rows: row b*3+c. Set basis 1..3 of channel 0 to
    # 10/20/30 on every gaussian.
    for b, v in ((1, 10.0), (2, 20.0), (3, 30.0)):
        sh[b * 3 + 0, :4] = v
    import jax.numpy as jnp

    model = model._replace(sh=jnp.asarray(sh))
    path = str(tmp_path / "m.ply")
    save_ply(path, model)
    with open(path, "rb") as f:
        while f.readline().strip() != b"end_header":
            pass
        row = np.frombuffer(f.read(4 * 26), dtype="<f4")  # deg-1 row: 26 floats
    f_rest = row[9:18]
    np.testing.assert_allclose(f_rest[:3], [10.0, 20.0, 30.0], atol=1e-6)
    np.testing.assert_allclose(f_rest[3:], 0.0, atol=1e-6)


def test_render_equivalence(tmp_path):
    """Round-tripped model renders the identical image."""
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render

    model = _random_model(n=200, deg=2, seed=3)
    path = str(tmp_path / "m.ply")
    save_ply(path, model)
    back = load_ply(path, capacity=model.capacity)
    P = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    K = jnp.asarray([[[90.0, 0, 64], [0, 90.0, 48], [0, 0, 1]]])
    cfg = RenderConfig(max_per_tile=256, tile_chunk=16)
    img_a, _ = render(model, P, K, (128, 96), cfg)
    img_b, _ = render(back, P, K, (128, 96), cfg)
    np.testing.assert_allclose(
        np.asarray(img_a), np.asarray(img_b), atol=1e-6
    )
