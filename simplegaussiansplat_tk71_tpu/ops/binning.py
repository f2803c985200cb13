"""Gaussian -> tile binning with static shapes.

The reference rasterizer expands every projected Gaussian's 3-sigma box into an
explicit per-pixel fragment list and sorts fragments by pixel key
(gs_model.py:419-428, uitility.py:336-366). On TPU we instead build, per image,
a fixed-capacity table of (tile, depth)-sorted Gaussian ids:

  1. per-Gaussian covered tile span from its clamped bbox;
  2. expand to (gaussian, tile) pairs into a static capacity ``max_pairs``
     via exclusive-cumsum offsets + vectorized searchsorted (no host sync);
  3. lexicographic device sort by (tile, depth) — jax.lax.sort with
     num_keys=2 replaces the reference's global z-argsort + per-pixel keyed
     sort (gs_model.py:356-365, :541-555);
  4. per-tile segment extraction into a dense (num_tiles, max_per_tile)
     id table + validity mask.

Overflow (dropped pairs or per-tile truncation beyond ``max_per_tile``) is
returned, never silent — callers surface it in metrics.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    ids: jnp.ndarray  # (T, K) int32 gaussian indices, front-to-back
    mask: jnp.ndarray  # (T, K) bool slot validity
    num_pairs: jnp.ndarray  # () int32 total (gaussian, tile) pairs pre-capacity
    dropped_pairs: jnp.ndarray  # () int32 pairs lost to max_pairs capacity
    truncated: jnp.ndarray  # () int32 fragments lost to max_per_tile


def bin_gaussians(
    mean2d: jnp.ndarray,
    bbox_half: jnp.ndarray,
    depth: jnp.ndarray,
    valid: jnp.ndarray,
    img_wh,
    tile_size: int = 16,
    max_pairs: int | None = None,
    max_per_tile: int = 512,
) -> TileBins:
    """Build per-tile depth-sorted Gaussian id lists for one camera.

    Args:
      mean2d: (N, 2) pixel means; bbox_half: (N, 2) half extents;
      depth: (N,) camera z; valid: (N,) cull mask (ops.projection).
      img_wh: (width, height) static ints divisible by tile_size.
      max_pairs: static capacity of the pair list (default 8*N).
      max_per_tile: static depth-list length K per tile.
    """
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx, nty = -(-width // ts), -(-height // ts)  # ceil: odd image sizes OK
    T = ntx * nty
    N = mean2d.shape[0]
    P = max_pairs if max_pairs is not None else 8 * N

    # --- 1. covered tile spans ---
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - bbox_half[:, 0]) / ts), 0, ntx - 1)
    x1 = jnp.clip(jnp.floor((mean2d[:, 0] + bbox_half[:, 0]) / ts), 0, ntx - 1)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - bbox_half[:, 1]) / ts), 0, nty - 1)
    y1 = jnp.clip(jnp.floor((mean2d[:, 1] + bbox_half[:, 1]) / ts), 0, nty - 1)
    tx0 = x0.astype(jnp.int32)
    ty0 = y0.astype(jnp.int32)
    span_w = (x1 - x0).astype(jnp.int32) + 1
    span_h = (y1 - y0).astype(jnp.int32) + 1
    counts = jnp.where(valid, span_w * span_h, 0)

    # --- 2. expand to pairs (static capacity P) ---
    cum = jnp.cumsum(counts)  # inclusive
    total = cum[-1] if N > 0 else jnp.int32(0)
    j = jnp.arange(P, dtype=jnp.int32)
    # owner gaussian of pair j: first g with cum[g] > j
    g = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    g = jnp.minimum(g, N - 1)
    local = j - (cum[g] - counts[g])
    lx = local % span_w[g]
    ly = local // span_w[g]
    tile = (ty0[g] + ly) * ntx + (tx0[g] + lx)
    pair_valid = j < total
    # invalid pairs get sentinel tile T so they sort to the tail
    tile = jnp.where(pair_valid, tile, T).astype(jnp.int32)

    # --- 3. lexicographic sort by (tile, depth) ---
    sort_depth = jnp.where(pair_valid, depth[g], jnp.inf).astype(jnp.float32)
    tile_s, _, g_s = jax.lax.sort(
        (tile, sort_depth, g), num_keys=2, is_stable=False
    )

    # --- 4. per-tile segments -> dense (T, K) table ---
    tids = jnp.arange(T, dtype=jnp.int32)
    seg_start = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
    seg_end = jnp.searchsorted(tile_s, tids, side="right").astype(jnp.int32)
    seg_len = seg_end - seg_start
    K = max_per_tile
    k = jnp.arange(K, dtype=jnp.int32)
    gather_idx = jnp.minimum(seg_start[:, None] + k[None, :], P - 1)
    ids = g_s[gather_idx]
    mask = k[None, :] < jnp.minimum(seg_len, K)[:, None]

    dropped = jnp.maximum(total - P, 0).astype(jnp.int32)
    truncated = jnp.sum(jnp.maximum(seg_len - K, 0)).astype(jnp.int32)
    return TileBins(
        ids=ids,
        mask=mask,
        num_pairs=total.astype(jnp.int32),
        dropped_pairs=dropped,
        truncated=truncated,
    )
