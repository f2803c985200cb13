"""Photometric loss: (1 - lambda) * L1 + lambda * (1 - SSIM).

Reference: gs_control.py:180-182 with lambda = 0.2, SSIM window 11, max_val 1.
Images here are (M, H, W, 3); the SSIM window runs over H, W with channels and
batch folded into leading dims.
"""

import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.utils.metrics import ssim


def photometric_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    loss_lambda: float = 0.2,
    ssim_window: int = 11,
):
    """pred/target: (M, H, W, 3) in [0, 1]. Returns (loss, (l1, dssim))."""
    l1 = jnp.mean(jnp.abs(pred - target))
    # fold channels to leading: (M, 3, H, W) view for the 2D window
    p = jnp.moveaxis(pred, -1, 1)
    t = jnp.moveaxis(target, -1, 1)
    s = ssim(p, t, max_val=1.0, window_size=ssim_window)
    dssim = 1.0 - s
    return (1.0 - loss_lambda) * l1 + loss_lambda * dssim, (l1, dssim)
