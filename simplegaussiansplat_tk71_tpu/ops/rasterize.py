"""Tile-based alpha compositing of projected Gaussians (pure-jnp path).

This is the TPU-first redesign of the reference's rasterizer
(gs_model.py:477-820 + cuda_kernel/grouped_cumprod_*.cu): instead of expanding
each Gaussian's bounding box into a flat per-pixel fragment list and running a
*segmented* scan keyed by pixel id (thrust inclusive_scan_by_key), we lay each
tile's depth-sorted Gaussian list out densely as an (K_depth, P_pixels) block.
In that layout the transmittance

    T_k(p) = prod_{j<k} (1 - alpha_j(p))          [spec eq. (6)]

is a plain *exclusive cumprod along the depth axis* — mathematically identical
to the reference's keyed scan, but static-shaped, vectorizable, and ideal for
the TPU VPU/MXU. The backward pass implements the analytic gradients of the
reference spec (jidou-bibun md, eq. 10-141; code gs_model.py:733-766):

    w_k(p)   = <dL/dI(p), p_k(p)>                 per-fragment pixel grad
    S_k(p)   = sum_{j>k} w_j(p)                    exclusive suffix sum
    u_k(p)   = T_k c_k - S_k / (1 - alpha_k)       with c_k = <dL/dI, col_k>
    dL/dop_k    = sum_p g u
    dL/dcol_kc  = sum_p dL/dI_c T alpha            (corrected; see note)
    dL/dmu_k    = sum_p (op u g) * (Lambda d)
    dL/dLambda  = sum_p (op u g) * (-1/2) d d^T

where d = r - mu and the exclusive suffix sum replaces the reference's flipped
grouped_cumsum (gs_model.py:716-722). Residuals are NOT saved: the backward
recomputes the forward per tile chunk, mirroring the reference's chunk-recompute
gradient checkpointing (gs_model.py:799-803).

Note on dL/dcol: the reference computes grad_l = w / l (gs_model.py:762-766),
which sums over channels before dividing — its own spec (eq. for dL/dl) gives
dL/dl_c = dL/dI_c * T * o * g, which is the default here; pass
``grad_color_wl=True`` (RenderConfig.grad_color_wl) to reproduce the
reference's w/l formula bit-for-bit (parity switch, PARITY.md).

Parity quirks vs. the reference covered by flags/tests:
- pixel sample coordinates: ``pixel_offset`` (default 0.5 = pixel centers;
  the reference evaluates at integer coords on a (H+1, W+1) canvas trimmed by
  [1:, 1:], i.e. offset 1.0 — see gs_model.py:454,505,541).
- no alpha clamp in the reference; we guard 1-alpha >= ANTI_EPS in backward
  divisions (the CUDA kernel guards 0 -> 1e-8, grouped_cumprod_backward.cu:25).
"""

import functools

import jax
import jax.numpy as jnp

ANTI_EPS = 1e-8


def _tile_pixel_coords(tile_origins, tile_size: int, pixel_offset: float):
    """(T, 2) tile origins -> (T, P, 2) float pixel sample coords."""
    ts = tile_size
    ly = jax.lax.broadcasted_iota(jnp.float32, (ts, ts), 0)
    lx = jax.lax.broadcasted_iota(jnp.float32, (ts, ts), 1)
    local = jnp.stack([lx.reshape(-1), ly.reshape(-1)], axis=-1)  # (P, 2)
    return tile_origins[:, None, :].astype(jnp.float32) + local[None] + pixel_offset


def _forward_dense(mu, con, col, op, mask, pix):
    """Dense per-tile composite.

    mu: (T, K, 2), con: (T, K, 3) packed (a, b, c) conic, col: (T, K, 3),
    op: (T, K), mask: (T, K) bool, pix: (T, P, 2).
    Returns (tile_img (T, P, 3), aux tensors for reuse in backward).
    """
    dx = pix[:, None, :, 0] - mu[:, :, None, 0]  # (T, K, P)
    dy = pix[:, None, :, 1] - mu[:, :, None, 1]
    a = con[:, :, 0:1]
    b = con[:, :, 1:2]
    c = con[:, :, 2:3]
    q = a * dx * dx + 2.0 * b * dx * dy + c * dy * dy
    # gate q < 0 lanes to exactly 0 (numerically non-PSD conic from the f32
    # det cancellation in ops/projection.py; ungated this is exp(+big) = inf
    # and t_excl * alpha = 0 * inf = NaN — see ops/rasterize_pallas
    # _gauss_weight and official 3DGS forward.cu "power > 0 -> skip")
    g = jnp.where(q >= 0.0, jnp.exp(-0.5 * jnp.maximum(q, 0.0)), 0.0)
    alpha = op[:, :, None] * g
    alpha = jnp.where(mask[:, :, None], alpha, 0.0)
    # Masked slots can gather garbage attributes (incl. NaN after a divergent
    # step): zero the colors too so 0-weight x NaN-color cannot poison the sum.
    col = jnp.where(mask[:, :, None], col, 0.0)
    anti = 1.0 - alpha
    # exclusive cumprod along depth: T_k = prod_{j<k} anti_j
    t_incl = jnp.cumprod(anti, axis=1)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[:, :1]), t_incl[:, :-1]], axis=1
    )
    w = t_excl * alpha  # (T, K, P) composite weights
    tile_img = jnp.einsum("tkp,tkc->tpc", w, col, precision="highest")
    return tile_img, (dx, dy, g, alpha, anti, t_excl, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _composite(grad_color_wl, mu, con, col, op, mask, pix):
    tile_img, _ = _forward_dense(mu, con, col, op, mask, pix)
    return tile_img


def _composite_fwd(grad_color_wl, mu, con, col, op, mask, pix):
    tile_img, _ = _forward_dense(mu, con, col, op, mask, pix)
    # Chunk-recompute checkpointing: save only the inputs (reference
    # gs_model.py:799-803 recomputes each chunk's forward in backward).
    return tile_img, (mu, con, col, op, mask, pix)


def _composite_bwd(grad_color_wl, res, g_img):
    mu, con, col, op, mask, pix = res
    _, (dx, dy, g, alpha, anti, t_excl, w) = _forward_dense(
        mu, con, col, op, mask, pix
    )
    col = jnp.where(mask[:, :, None], col, 0.0)  # garbage-gather guard (see fwd)
    # c_k(p) = <dL/dI(p), col_k>  (T, K, P)
    ck = jnp.einsum("tpc,tkc->tkp", g_img, col, precision="highest")
    wk = w * ck  # fragment pixel-grad  w_k = <dL/dI, p_k>
    # exclusive suffix sum over depth
    total = jnp.sum(wk, axis=1, keepdims=True)
    suffix = total - jnp.cumsum(wk, axis=1)  # S_k = sum_{j>k} w_j
    anti_safe = jnp.maximum(anti, ANTI_EPS)
    u = t_excl * ck - suffix / anti_safe  # (T, K, P)
    u = jnp.where(mask[:, :, None], u, 0.0)

    if grad_color_wl:
        # reference parity quirk (gs_model.py:762-766, grad_l = w / l): the
        # per-fragment pixel grad w_k = <dL/dI, p_k> (summed over channels)
        # divided elementwise by the color, zeroed where any channel is 0
        # (the reference's (l != 0).all(dim=1) mask)
        s = jnp.sum(wk, axis=-1)  # (T, K): sum_p w_k(p)
        allnz = jnp.all(col != 0.0, axis=-1)  # (T, K)
        g_col = jnp.where(
            allnz[..., None],
            s[..., None] / jnp.where(col == 0.0, 1.0, col),
            0.0,
        )
    else:
        # spec-correct dL/dcol_c = sum_p dL/dI_c * T * alpha
        g_col = jnp.einsum(
            "tkp,tpc->tkc", t_excl * alpha, g_img, precision="highest"
        )
    # dL/dop: sum_p g * u
    g_op = jnp.sum(g * u, axis=-1)
    # m = op * u * g — shared scalar for mu / conic grads
    m = op[:, :, None] * u * g
    a = con[:, :, 0:1]
    b = con[:, :, 1:2]
    c = con[:, :, 2:3]
    # dg/dmu = g * (Lambda d); dL/dmu = sum_p m * (Lambda d)
    g_mu_x = jnp.sum(m * (a * dx + b * dy), axis=-1)
    g_mu_y = jnp.sum(m * (b * dx + c * dy), axis=-1)
    g_mu = jnp.stack([g_mu_x, g_mu_y], axis=-1)
    # dg/dLambda = -1/2 g d d^T; conic packed (a, b, c) with b off-diagonal
    # counted twice (Lambda symmetric), so dL/db gets factor 2 * (-1/2) = -1.
    g_ca = jnp.sum(-0.5 * m * dx * dx, axis=-1)
    g_cb = jnp.sum(-m * dx * dy, axis=-1)
    g_cc = jnp.sum(-0.5 * m * dy * dy, axis=-1)
    g_con = jnp.stack([g_ca, g_cb, g_cc], axis=-1)

    zero_mask = mask[:, :, None]
    g_mu = jnp.where(zero_mask, g_mu, 0.0)
    g_con = jnp.where(zero_mask, g_con, 0.0)
    g_col = jnp.where(zero_mask, g_col, 0.0)
    g_op = jnp.where(mask, g_op, 0.0)
    return g_mu, g_con, g_col, g_op, None, None


_composite.defvjp(_composite_fwd, _composite_bwd)


def rasterize_tile_block(
    ids,
    mask,
    mean2d,
    conic,
    color,
    opacity,
    tile_indices,
    img_wh,
    tile_size: int = 16,
    tile_chunk: int = 64,
    pixel_offset: float = 0.5,
    grad_color_wl: bool = False,
):
    """Composite an arbitrary block of tiles.

    tile_indices: (Tb,) int32 global tile ids (row-major over the ceil tile
    grid) — may be a traced slice, enabling tile-sharded rendering across
    chips (parallel/tile_sharding). Returns (Tb, ts, ts, 3) tile images.
    """
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx = -(-width // ts)
    Tb = ids.shape[0]

    # projected attributes arrive component-major (C, N) — see NOTES.md
    # layout tax; this pure-XLA path gathers rows, so transpose once here
    mean2d = jnp.swapaxes(mean2d, 0, 1)
    conic = jnp.swapaxes(conic, 0, 1)
    color = jnp.swapaxes(color, 0, 1)

    tx = tile_indices % ntx
    ty = tile_indices // ntx
    tile_origins = jnp.stack([tx * ts, ty * ts], axis=-1)  # (Tb, 2)
    pix_all = _tile_pixel_coords(tile_origins, ts, pixel_offset)  # (Tb, P, 2)

    tile_chunk = min(tile_chunk, Tb)
    n_chunks = -(-Tb // tile_chunk)
    Tb_pad = n_chunks * tile_chunk
    if Tb_pad != Tb:
        pad = Tb_pad - Tb
        ids = jnp.pad(ids, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        pix_all = jnp.pad(pix_all, ((0, pad), (0, 0), (0, 0)))

    def body(chunk_idx):
        sl = chunk_idx * tile_chunk
        ids_c = jax.lax.dynamic_slice_in_dim(ids, sl, tile_chunk, axis=0)
        mask_c = jax.lax.dynamic_slice_in_dim(mask, sl, tile_chunk, axis=0)
        pix_c = jax.lax.dynamic_slice_in_dim(pix_all, sl, tile_chunk, axis=0)
        mu = mean2d[ids_c]
        con = conic[ids_c]
        col = color[ids_c]
        op = opacity[ids_c]
        return _composite(grad_color_wl, mu, con, col, op, mask_c, pix_c)

    tile_imgs = jax.lax.map(body, jnp.arange(n_chunks))  # (n_chunks, tc, P, 3)
    return tile_imgs.reshape(Tb_pad, ts, ts, 3)[:Tb]


def rasterize_tiles(
    ids,
    mask,
    mean2d,
    conic,
    color,
    opacity,
    img_wh,
    tile_size: int = 16,
    tile_chunk: int = 64,
    pixel_offset: float = 0.5,
    background=None,
    grad_color_wl: bool = False,
):
    """Composite one camera's image from per-tile Gaussian id lists.

    Args:
      ids: (T, K) int32 indices into the projected-attribute arrays,
        depth-sorted front-to-back per tile (from ops.binning).
      mask: (T, K) bool validity of each slot.
      mean2d: (2, N); conic: (3, N) packed (a, b, c); color: (3, N);
      opacity: (N,) — per-gaussian screen-space attributes for this camera,
      component-major (ops/projection layout).
      img_wh: (width, height) static ints; both divisible by tile_size.
      tile_chunk: tiles processed per lax.map step (memory knob; the analog
        of the reference's fragment-budget chunking, gs_model.py:428).
      background: optional (3,) background color composited behind.

    Returns (H, W, 3) image. Image sizes need not be tile-aligned: the tile
    grid covers ceil(W/ts) x ceil(H/ts) and the result is cropped (real
    datasets are odd-sized, e.g. the reference's 640x427 images).
    """
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx = -(-width // ts)
    nty = -(-height // ts)
    T = ntx * nty
    assert ids.shape[0] == T, (ids.shape, T)

    tile_imgs = rasterize_tile_block(
        ids, mask, mean2d, conic, color, opacity,
        jnp.arange(T, dtype=jnp.int32), img_wh,
        tile_size=tile_size, tile_chunk=tile_chunk, pixel_offset=pixel_offset,
        grad_color_wl=grad_color_wl,
    )
    image = tile_imgs.reshape(nty, ntx, ts, ts, 3).transpose(0, 2, 1, 3, 4)
    image = image.reshape(nty * ts, ntx * ts, 3)[:height, :width]

    if background is not None:
        # remaining transmittance = 1 - sum of alpha-composite weights; we do
        # not track it in the fused path, so composite bg from the alpha sum
        # of the color channels is not available — instead callers wanting a
        # background should append a far plane gaussian. Kept None by default
        # (reference composites onto a zero canvas, gs_model.py:503-505).
        raise NotImplementedError("background compositing: use a far plane")
    return image
