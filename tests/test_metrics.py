import numpy as np
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.utils.metrics import psnr, ssim


def _ssim_reference_np(img1, img2, max_val=1.0, win=11, sigma=1.5):
    """Independent O(N*win^2) direct implementation (no separable conv),
    gaussian window, reflect padding — the kornia.metrics.ssim contract."""
    x = np.arange(win) - (win - 1) / 2
    k1d = np.exp(-0.5 * (x / sigma) ** 2)
    k1d /= k1d.sum()
    k2d = np.outer(k1d, k1d)
    pad = win // 2

    def blur(im):
        im_p = np.pad(im, pad, mode="reflect")
        out = np.zeros_like(im)
        H, W = im.shape
        for i in range(H):
            for j in range(W):
                out[i, j] = np.sum(im_p[i : i + win, j : j + win] * k2d)
        return out

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu1, mu2 = blur(img1), blur(img2)
    s1 = blur(img1 * img1) - mu1 * mu1
    s2 = blur(img2 * img2) - mu2 * mu2
    s12 = blur(img1 * img2) - mu1 * mu2
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    return (num / den).mean()


def test_ssim_matches_direct_implementation():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (24, 28)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _ssim_reference_np(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_ssim_identical_images():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-5


def test_psnr():
    a = jnp.zeros((8, 8))
    b = jnp.full((8, 8), 0.1)
    assert abs(float(psnr(a, b)) - 20.0) < 1e-3
