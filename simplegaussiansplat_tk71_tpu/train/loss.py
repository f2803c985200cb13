"""Photometric loss: (1 - lambda) * L1 + lambda * (1 - SSIM).

Reference: gs_control.py:180-182 with lambda = 0.2, SSIM window 11, max_val 1.
Images here are (M, H, W, 3); the SSIM window runs over H, W with channels and
batch folded into leading dims.

Mixed per-camera image sizes (the reference processes each image at its own
W/H inside a Python loop, gs_load_colmap.py:114-115 + gs_model.py:402-451):
under static shapes every camera renders at the padded max size and a
per-camera pixel-validity ``mask`` (M, H, W) restricts the loss — masked L1
is normalized by the true pixel count, and the SSIM map is averaged over
valid pixels only (windows straddling the boundary see zeros on both sides,
a border effect comparable to the reference's reflect same-padding).
"""

import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.utils.metrics import ssim, ssim_map


def photometric_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    loss_lambda: float = 0.2,
    ssim_window: int = 11,
    mask: jnp.ndarray | None = None,
):
    """pred/target: (M, H, W, 3) in [0, 1]. Returns (loss, (l1, dssim)).

    mask: optional (M, H, W) validity for mixed-size scenes (see module
    docstring). None keeps the exact uniform-size computation.
    """
    if mask is None:
        l1 = jnp.mean(jnp.abs(pred - target))
        # fold channels to leading: (M, 3, H, W) view for the 2D window
        p = jnp.moveaxis(pred, -1, 1)
        t = jnp.moveaxis(target, -1, 1)
        s = ssim(p, t, max_val=1.0, window_size=ssim_window)
    else:
        m = mask.astype(pred.dtype)[..., None]  # (M, H, W, 1)
        denom = jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)
        pred = pred * m
        target = target * m
        l1 = jnp.sum(jnp.abs(pred - target)) / denom
        p = jnp.moveaxis(pred, -1, 1)
        t = jnp.moveaxis(target, -1, 1)
        smap = ssim_map(p, t, max_val=1.0, window_size=ssim_window)
        mw = jnp.moveaxis(m, -1, 1)  # (M, 1, H, W)
        s = jnp.sum(smap * mw) / denom
    dssim = 1.0 - s
    return (1.0 - loss_lambda) * l1 + loss_lambda * dssim, (l1, dssim)
