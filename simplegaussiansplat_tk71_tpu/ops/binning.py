"""Gaussian -> tile binning with static shapes.

The reference rasterizer expands every projected Gaussian's 3-sigma box into an
explicit per-pixel fragment list and sorts fragments by pixel key
(gs_model.py:419-428, uitility.py:336-366). On TPU we instead build, per image,
a fixed-capacity table of (tile, depth)-sorted Gaussian ids:

  1. depth-argsort the N gaussians once (replaces the reference's global
     z-argsort, gs_model.py:356-365) and reorder the per-gaussian tile spans;
  2. expand to (gaussian, tile) pairs into a static capacity ``max_pairs``.
     Pairs are generated in depth-major order, so depth order inside every
     tile is inherited — the pair sort then needs only the tile id as key;
  3. owner lookup (pair j -> gaussian) with a sort-merge searchsorted. All
     per-gaussian attributes needed per pair travel in ONE packed (N, 5) row
     gather (random HBM gathers are the cost center on TPU — measured 6x
     scalar gathers at 4M pairs = ~400 ms vs ~80 ms packed);
  4. stable single-key sort by tile id groups pairs per tile;
  5. per-tile segment extraction into a dense (num_tiles, max_per_tile)
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
    # --- pair-space gradient routing (ops/rasterize_pallas) ---
    # Depth-major pairs are contiguous per depth rank with SORTED rank keys
    # (rank_of_dm), so per-gaussian gradient reduction becomes: gather
    # per-slot grads into depth-major pair order (slot_of_dm), a sorted-key
    # segment sum (ops/segsum pallas kernel: per-block one-hot MXU matmuls
    # with a carried boundary partial), and a permutation gather by inv_rank
    # — replacing the duplicate-accumulating scatter-add transpose
    # (measured 157 ms -> ~45 ms at 2.5M pairs on v5e; TPU gathers are
    # 5-15x cheaper than scatters, and the segment sum rides the MXU).
    slot_of_dm: jnp.ndarray  # (P,) int32 dense-table slot t*K+k of depth-major pair j, or sentinel T*K
    rank_of_dm: jnp.ndarray  # (P,) int32 owner depth rank of pair j (sorted)
    inv_rank: jnp.ndarray  # (N,) int32 depth rank of gaussian i
    n_live: jnp.ndarray  # () int32 ranks with >=1 surviving pair (a prefix)


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
      img_wh: (width, height) static ints (any size; tile grid is ceil).
      max_pairs: static capacity of the pair list (default 8*N).
      max_per_tile: static depth-list length K per tile.
    """
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx, nty = -(-width // ts), -(-height // ts)  # ceil: odd image sizes OK
    T = ntx * nty
    N = mean2d.shape[0]
    P = max_pairs if max_pairs is not None else 8 * N
    K = max_per_tile

    # --- 1. depth order + covered tile spans (in depth order) ---
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf)).astype(jnp.int32)
    m2 = mean2d[order]
    bb = bbox_half[order]
    x0 = jnp.clip(jnp.floor((m2[:, 0] - bb[:, 0]) / ts), 0, ntx - 1)
    x1 = jnp.clip(jnp.floor((m2[:, 0] + bb[:, 0]) / ts), 0, ntx - 1)
    y0 = jnp.clip(jnp.floor((m2[:, 1] - bb[:, 1]) / ts), 0, nty - 1)
    y1 = jnp.clip(jnp.floor((m2[:, 1] + bb[:, 1]) / ts), 0, nty - 1)
    tx0 = x0.astype(jnp.int32)
    ty0 = y0.astype(jnp.int32)
    span_w = (x1 - x0).astype(jnp.int32) + 1
    span_h = (y1 - y0).astype(jnp.int32) + 1
    counts = jnp.where(valid[order], span_w * span_h, 0)

    # --- 2+3. expand to pairs; owner of pair j = first g with cum[g] > j
    # = #{g : cum[g] <= j}. Because the queries are just arange(P), that
    # count is the cumsum of a histogram of the cum values — one 1-D
    # scatter-add + one int cumsum (~40 ms at P=2.5M on v5e, vs ~74 ms for
    # a sort-merge searchsorted and ~1.1 s for the binary-search default).
    cum = jnp.cumsum(counts)  # inclusive
    total = cum[-1]
    offsets = cum - counts  # exclusive
    j = jnp.arange(P, dtype=jnp.int32)
    hist = jnp.zeros((P,), jnp.int32).at[jnp.minimum(cum, P - 1)].add(
        1, mode="drop"
    )
    g = jnp.minimum(jnp.cumsum(hist), N - 1)

    # one packed row gather for everything the expansion needs
    packed = jnp.stack([tx0, ty0, span_w, offsets, order], axis=1)  # (N, 5)
    rows = packed[g]  # (P, 5)
    local = j - rows[:, 3]
    lx = local % rows[:, 2]
    ly = local // rows[:, 2]
    tile = (rows[:, 1] + ly) * ntx + (rows[:, 0] + lx)
    pair_valid = j < total
    tile = jnp.where(pair_valid, tile, T).astype(jnp.int32)  # sentinel tail
    gid = rows[:, 4]  # original gaussian index

    # --- 4. stable tile-key sort (depth order inherited within tiles);
    # j rides along so each sorted position knows its depth-major index ---
    tile_s, gid_s, dm_idx = jax.lax.sort(
        (tile, gid, j), num_keys=1, is_stable=True
    )

    # --- 5. per-tile segments -> dense (T, K) table ---
    tids = jnp.arange(T, dtype=jnp.int32)
    seg_start = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
    seg_end = jnp.searchsorted(tile_s, tids, side="right").astype(jnp.int32)
    seg_len = seg_end - seg_start
    k = jnp.arange(K, dtype=jnp.int32)
    gather_idx = jnp.minimum(seg_start[:, None] + k[None, :], P - 1)
    ids = gid_s[gather_idx]
    mask = k[None, :] < jnp.minimum(seg_len, K)[:, None]

    # --- 6. gradient-routing tables (see TileBins docstring) ---
    # slot of tile-sorted pair q (sentinel T*K for padding/truncated pairs),
    # permuted into depth-major order. Both permutation inverses are done
    # with key sorts, not scatters: sorting (perm, payload) by the unique
    # perm keys IS the inverse permutation, and lax.sort measures ~2x
    # cheaper than the equivalent unique scatter-set on v5e (9.6 ms vs
    # 17.5 ms at 2.5M int32).
    t_q = jnp.minimum(tile_s, T - 1)
    k_q = j - seg_start[t_q]
    in_table = (tile_s < T) & (k_q < K)
    slot_q = jnp.where(in_table, t_q * K + k_q, T * K).astype(jnp.int32)
    _, slot_of_dm = jax.lax.sort((dm_idx, slot_q), num_keys=1)
    _, inv_rank = jax.lax.sort(
        (order, jnp.arange(N, dtype=jnp.int32)), num_keys=1
    )
    # ranks with surviving pairs form a prefix: counts > 0 iff valid (valid
    # ranks sort first; spans are always >= 1), and capacity drops cut the
    # depth-major tail (offsets nondecreasing)
    n_live = jnp.minimum(
        jnp.sum(counts > 0),
        jnp.searchsorted(offsets, P, side="left"),
    ).astype(jnp.int32)

    dropped = jnp.maximum(total - P, 0).astype(jnp.int32)
    truncated = jnp.sum(jnp.maximum(seg_len - K, 0)).astype(jnp.int32)
    return TileBins(
        ids=ids,
        mask=mask,
        num_pairs=total.astype(jnp.int32),
        dropped_pairs=dropped,
        truncated=truncated,
        slot_of_dm=slot_of_dm,
        rank_of_dm=g,
        inv_rank=inv_rank,
        n_live=n_live,
    )
