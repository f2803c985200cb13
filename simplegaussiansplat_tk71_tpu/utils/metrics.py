"""Image metrics: SSIM (gaussian-windowed) and PSNR.

The reference's loss uses kornia.metrics.ssim with window_size=11, max_val=1.0
(gs_control.py:180-182): an 11x11 gaussian window (sigma=1.5), same-padded
with reflect borders, C1=(0.01*max)^2, C2=(0.03*max)^2. This is that
computation in jnp, written as depthwise separable convolutions so XLA maps it
onto fused conv ops.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache
def _gaussian_kernel1d(window_size: int, sigma: float):
    # pure numpy on purpose: a cached jnp array created inside a jit trace
    # would leak a tracer into later traces
    x = np.arange(window_size, dtype=np.float64) - (window_size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur of (..., H, W) with reflect same-padding."""
    k = _gaussian_kernel1d(window_size, sigma)
    pad = window_size // 2
    x = jnp.pad(
        img,
        [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)],
        mode="reflect",
    )
    x = _conv_last(x, k)
    x = jnp.swapaxes(_conv_last(jnp.swapaxes(x, -1, -2), k), -1, -2)
    return x


def _conv_last(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """'valid' correlation along the last axis via dot with a banded gather."""
    w = k.shape[0]
    n = x.shape[-1]
    out_n = n - w + 1
    # gather w shifted views and weight-sum: small w (11) -> fully fused
    acc = jnp.zeros(x.shape[:-1] + (out_n,), x.dtype)
    for i in range(w):
        acc = acc + k[i] * jax.lax.slice_in_dim(x, i, i + out_n, axis=-1)
    return acc


def ssim_map(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Per-pixel SSIM map over (..., H, W) (same shape as the inputs)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    blur = functools.partial(_blur, window_size=window_size, sigma=sigma)
    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    s1 = blur(img1 * img1) - mu1_sq
    s2 = blur(img2 * img2) - mu2_sq
    s12 = blur(img1 * img2) - mu12
    num = (2 * mu12 + c1) * (2 * s12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    return num / den


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over (..., H, W) images (channels folded into leading dims).

    Matches kornia.metrics.ssim(window_size=11, max_val=1.0).mean() used by
    the reference loss (gs_control.py:180).
    """
    return jnp.mean(ssim_map(img1, img2, max_val, window_size, sigma))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean(jnp.square(img1 - img2))
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))
