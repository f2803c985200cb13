"""Pallas TPU kernels for tile compositing.

Same math as ops/rasterize.py (the reference's forward eq. 6-9 and analytic
backward eq. 10-141 of the spec, gs_model.py:493-766), but the whole per-tile
pipeline — Gauss kernel, depth cumprod, composite, and all four gradients —
runs in VMEM in one pass per tile, with Mosaic double-buffering the per-tile
attribute blocks from HBM. The XLA path materializes every (tiles, K, pixels)
intermediate to HBM; this kernel touches HBM once per tile for input and once
for output.

Layouts (lane-dim last, 128-aligned; tile dim leads so each grid step's
block is (1, A, K) / (1, 8, P) with aligned trailing dims):
  attrs: (T, A=16, K)  rows 0..8 = mux, muy, conic a, b, c, opacity, r, g, b
         (opacity pre-masked to 0 for invalid slots — op > 0 is the validity
         test in-kernel; sigmoid can never be exactly 0 for a live gaussian)
  out:   (T, 8, P)     rows 0..2 = composited RGB for the tile's P pixels
  grads: (T, 16, K)    rows 0..8 = d mux, d muy, d a, d b, d c, d op, d rgb

The depth-axis exclusive cumprod / suffix cumsum are Hillis-Steele scans over
the K (sublane) axis — log2(K) shift+combine steps on (K, P) VMEM tiles,
the in-register equivalent of the reference's thrust scans
(cuda_kernel/grouped_cumprod_forward.cu, grouped_cumsum flip trick
gs_model.py:716-722).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_ATTR_ROWS = 16  # 9 used; padded for sublane alignment


def _scan_shift(x, dist, fill):
    """Shift rows down by `dist` along axis 0, filling the top with `fill`."""
    k = x.shape[0]
    shifted = pltpu.roll(x, dist, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row < dist, fill, shifted)


def _exclusive_cumprod(x):
    """Exclusive cumprod along axis 0 (K) via Hillis-Steele, then shift."""
    k = x.shape[0]
    y = x
    d = 1
    while d < k:
        y = y * _scan_shift(y, d, 1.0)
        d *= 2
    # y is inclusive; exclusive = shift down by one, top = 1
    return _scan_shift(y, 1, 1.0)


def _inclusive_cumsum(x):
    k = x.shape[0]
    y = x
    d = 1
    while d < k:
        y = y + _scan_shift(y, d, 0.0)
        d *= 2
    return y


def _pixel_coords(pid, ntx, ts, pixel_offset):
    """(1, P) pixel-center x and y coords for tile `pid` (row-major pixels)."""
    tile_x = (pid % ntx) * ts
    tile_y = (pid // ntx) * ts
    p = jax.lax.broadcasted_iota(jnp.int32, (1, ts * ts), 1)
    px = (p % ts + tile_x).astype(jnp.float32) + pixel_offset
    py = (p // ts + tile_y).astype(jnp.float32) + pixel_offset
    return px, py


def _alphas(attrs, px, py):
    """Common forward core: returns (dx, dy, g, alpha, op_col) on (K, P)."""
    mux = attrs[0, :][:, None]
    muy = attrs[1, :][:, None]
    ca = attrs[2, :][:, None]
    cb = attrs[3, :][:, None]
    cc = attrs[4, :][:, None]
    op = attrs[5, :][:, None]
    dx = px - mux  # (K, P)
    dy = py - muy
    q = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
    g = jnp.exp(-0.5 * q)
    alpha = op * g
    return dx, dy, g, alpha, op


def _forward_kernel(ntx, ts, pixel_offset, attrs_ref, out_ref):
    pid = pl.program_id(0)
    attrs = attrs_ref[0]  # (A, K)
    px, py = _pixel_coords(pid, ntx, ts, pixel_offset)
    _, _, _, alpha, _ = _alphas(attrs, px, py)
    t_excl = _exclusive_cumprod(1.0 - alpha)
    w = t_excl * alpha  # (K, P)
    col = attrs[6:9, :]  # (3, K)
    img = jax.lax.dot_general(
        col, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (3, P)
    out_ref[0, :, :] = jnp.pad(img, ((0, 5), (0, 0)))


def _backward_kernel(ntx, ts, pixel_offset, attrs_ref, gimg_ref, grad_ref):
    pid = pl.program_id(0)
    attrs = attrs_ref[0]  # (A, K)
    gimg = gimg_ref[0, :3, :]  # (3, P)
    px, py = _pixel_coords(pid, ntx, ts, pixel_offset)
    dx, dy, g, alpha, op = _alphas(attrs, px, py)
    anti = 1.0 - alpha
    t_excl = _exclusive_cumprod(anti)
    col = attrs[6:9, :]  # (3, K)
    # ck(k, p) = <dL/dI(p), col_k>
    ck = jax.lax.dot_general(
        col, gimg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (K, P)
    w = t_excl * alpha
    wk = w * ck
    incl = _inclusive_cumsum(wk)
    total = incl[-1:, :]  # (1, P) total sum
    suffix = total - incl  # exclusive suffix sum S_k
    anti_safe = jnp.maximum(anti, 1e-8)
    u = t_excl * ck - suffix / anti_safe
    valid = op > 0.0
    u = jnp.where(valid, u, 0.0)

    m = op * u * g  # (K, P)
    ca = attrs[2, :][:, None]
    cb = attrs[3, :][:, None]
    cc = attrs[4, :][:, None]
    g_mux = jnp.sum(m * (ca * dx + cb * dy), axis=1)
    g_muy = jnp.sum(m * (cb * dx + cc * dy), axis=1)
    g_ca = jnp.sum(-0.5 * m * dx * dx, axis=1)
    g_cb = jnp.sum(-m * dx * dy, axis=1)
    g_cc = jnp.sum(-0.5 * m * dy * dy, axis=1)
    g_op = jnp.sum(g * u, axis=1)
    # dL/dcol_c = sum_p gI_c * T * alpha : (3, K)
    g_col = jax.lax.dot_general(
        gimg, t_excl * alpha, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    grads = jnp.stack([g_mux, g_muy, g_ca, g_cb, g_cc, g_op], axis=0)
    grads = jnp.concatenate([grads, g_col], axis=0)  # (9, K)
    # zero grads of masked slots — their ids point at clamped garbage rows
    valid_k = (attrs[5, :] > 0.0).astype(jnp.float32)[None, :]  # (1, K)
    grads = grads * valid_k
    grad_ref[0, :, :] = jnp.pad(grads, ((0, NUM_ATTR_ROWS - 9), (0, 0)))


def composite_tiles_pallas(attrs, img_wh, tile_size: int, pixel_offset: float):
    """attrs: (T, A, K) packed per-tile gathered attributes (see module doc).
    Returns (T, P) x 3-channel tile images as (T, 8, P) padded array."""
    T, A, K = attrs.shape
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx = -(-width // ts)
    P = ts * ts

    kernel = functools.partial(_forward_kernel, ntx, ts, pixel_offset)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, A, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 8, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
    )(attrs)


def composite_tiles_pallas_bwd(attrs, g_tiles, img_wh, tile_size: int, pixel_offset: float):
    """g_tiles: (T, 8, P) cotangent of the padded tile images.
    Returns (T, 16, K) packed per-slot gradients."""
    T, A, K = attrs.shape
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx = -(-width // ts)
    P = ts * ts

    kernel = functools.partial(_backward_kernel, ntx, ts, pixel_offset)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, A, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, NUM_ATTR_ROWS, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, NUM_ATTR_ROWS, K), jnp.float32),
    )(attrs, g_tiles)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _composite_pallas(attrs, img_wh, tile_size, pixel_offset):
    return composite_tiles_pallas(attrs, img_wh, tile_size, pixel_offset)


def _composite_pallas_fwd(attrs, img_wh, tile_size, pixel_offset):
    out = composite_tiles_pallas(attrs, img_wh, tile_size, pixel_offset)
    # chunk-recompute checkpointing: residual = inputs only (same policy as
    # the XLA path / reference gs_model.py:799-803)
    return out, attrs


def _composite_pallas_bwd(img_wh, tile_size, pixel_offset, attrs, g_tiles):
    g_attrs = composite_tiles_pallas_bwd(
        attrs, g_tiles, img_wh, tile_size, pixel_offset
    )
    return (g_attrs,)  # same (T, 16, K) layout as attrs


_composite_pallas.defvjp(_composite_pallas_fwd, _composite_pallas_bwd)


def rasterize_tiles_pallas(
    ids,
    mask,
    mean2d,
    conic,
    color,
    opacity,
    img_wh,
    tile_size: int = 16,
    pixel_offset: float = 0.5,
):
    """Drop-in Pallas replacement for ops.rasterize.rasterize_tiles.

    Gathers per-tile attributes with one XLA row-gather, runs the fused
    kernels, and assembles the image. Gradients flow to the per-gaussian
    attribute arrays through the gather's scatter-add transpose.
    """
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx = -(-width // ts)
    nty = -(-height // ts)
    T = ntx * nty
    P = ts * ts
    assert ids.shape[0] == T

    op_masked = jnp.where(mask, opacity[ids], 0.0)  # (T, K)

    def pack_and_run(mean2d, conic, color, op_masked):
        packed = jnp.concatenate(
            [
                mean2d,  # (N, 2)
                conic,  # (N, 3)
                jnp.zeros((mean2d.shape[0], 1), mean2d.dtype),  # op slot
                color,  # (N, 3)
            ],
            axis=1,
        )  # (N, 9)
        attrs_tk = packed[ids]  # (T, K, 9)
        attrs_tk = attrs_tk.at[:, :, 5].set(op_masked)
        attrs = jnp.swapaxes(attrs_tk, 1, 2)  # (T, 9, K)
        attrs = jnp.pad(attrs, ((0, 0), (0, NUM_ATTR_ROWS - 9), (0, 0)))
        return _composite_pallas(attrs, img_wh, ts, pixel_offset)

    out = pack_and_run(mean2d, conic, color, op_masked)  # (T, 8, P)
    tile_imgs = jnp.swapaxes(out[:, :3, :], 1, 2)  # (T, P, 3)
    image = tile_imgs.reshape(nty, ntx, ts, ts, 3).transpose(0, 2, 1, 3, 4)
    return image.reshape(nty * ts, ntx * ts, 3)[:height, :width]
