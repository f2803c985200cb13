"""Gaussian -> tile binning with static shapes.

The reference rasterizer expands every projected Gaussian's 3-sigma box into an
explicit per-pixel fragment list and sorts fragments by pixel key
(gs_model.py:419-428, uitility.py:336-366). On TPU we instead build, per image,
fixed-capacity *tile-sorted pair space*: for each camera a static list of
``max_pairs`` (gaussian, tile) pairs sorted by (tile, depth), from which the
compositor's per-tile depth lists are contiguous windows.

Pipeline (all static shapes; costs measured on v5e at 1M gaussians / 2.5M
pairs, see benchmarks/micro_sort_check3.py):

  1. per-gaussian covered tile spans straight from the projected boxes —
     gaussian-major, NO global depth argsort (the reference's z-argsort,
     gs_model.py:356-365, is replaced by the pair sort's depth key);
  2. owner lookup (pair j -> gaussian g): histogram of the count-cumsum +
     int cumsum (~9.5 ms, vs ~74 ms sort-merge searchsorted);
  3. one packed row gather of everything pair expansion needs (~12 ms;
     row gathers are latency-bound: 3 vs 5 int32 columns measure the same);
  4. one 2-key sort by (tile id, depth bits) (~8.6 ms; bitcast of a positive
     float is monotone, so depth order inside every tile is exact);
  5. per-tile segment spans via searchsorted on the sorted tile keys
     (~1.6 ms); the compositor reads pair-space windows directly
     (ops/rasterize_pallas.pair_attrs_to_table) — no (T, K) id table gather
     (that gather alone measured 18 ms) unless ``build_table`` is set for
     the XLA / tile-sharded paths.

Gradient routing (ops/rasterize_pallas._composite_pairroute_bwd) rides the
same pair space: gaussian-major pair order has *sorted* owner keys by
construction, so per-gaussian gradient reduction is a gather into
gaussian-major order + one MXU segment sum (ops/segsum) + one row gather —
no scatter-add and, unlike the old depth-major design, no extra
inverse-permutation sort for gaussian ranks (the segment key is the
valid-compaction index, a cumsum).

Overflow (dropped pairs or per-tile truncation beyond ``max_per_tile``) is
returned, never silent — callers surface it in metrics. Pair-capacity
overflow drops the pairs of the highest-index gaussians (gaussian-major
order); per-tile truncation drops the farthest-depth fragments.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    # dense (T, K) table — only when build_table=True (XLA + tile-sharded
    # compositors); the pallas pair-routed path reads pair space directly
    ids: Optional[jnp.ndarray]  # (T, K) int32 gaussian indices, front-to-back
    mask: Optional[jnp.ndarray]  # (T, K) bool slot validity
    num_pairs: jnp.ndarray  # () int32 total (gaussian, tile) pairs pre-capacity
    dropped_pairs: jnp.ndarray  # () int32 pairs lost to max_pairs capacity
    truncated: jnp.ndarray  # () int32 fragments lost to max_per_tile
    # --- tile-sorted pair space ---
    gid_s: jnp.ndarray  # (P,) int32 pair owner gaussian id, (tile, depth)-sorted
    seg_start: jnp.ndarray  # (T,) int32 first pair index of tile t
    seg_len: jnp.ndarray  # (T,) int32 true list length (may exceed K)
    # --- gradient routing (gaussian-major pair order) ---
    slot_of_om: jnp.ndarray  # (P,) int32 dense slot t*K+k of gaussian-major pair j, sentinel T*K
    key_of_om: jnp.ndarray  # (P,) int32 sorted segment key (owner's valid-compaction index)
    vid: jnp.ndarray  # (N,) int32 valid-compaction rank (nondecreasing, steps <= 1)
    key_of_gauss: jnp.ndarray  # (N,) int32 segment of gaussian i, -1 if no surviving pairs
    n_live: jnp.ndarray  # () int32 segments with >=1 surviving pair (a prefix)


def bin_gaussians(
    mean2d: jnp.ndarray,
    bbox_half: jnp.ndarray,
    depth: jnp.ndarray,
    valid: jnp.ndarray,
    img_wh,
    tile_size: int = 16,
    max_pairs: int | None = None,
    max_per_tile: int = 512,
    build_table: bool = True,
) -> TileBins:
    """Build tile-sorted pair space (+ optional dense id table) for one camera.

    Args:
      mean2d: (N, 2) pixel means; bbox_half: (N, 2) half extents;
      depth: (N,) camera z (positive where valid); valid: (N,) cull mask.
      img_wh: (width, height) static ints (any size; tile grid is ceil).
      max_pairs: static capacity of the pair list (default 8*N).
      max_per_tile: static depth-list length K per tile.
      build_table: also gather the (T, K) id table + mask (XLA path).
    """
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx, nty = -(-width // ts), -(-height // ts)  # ceil: odd image sizes OK
    T = ntx * nty
    N = mean2d.shape[0]
    P = max_pairs if max_pairs is not None else 8 * N
    K = max_per_tile

    # --- 1. covered tile spans, gaussian-major (no depth sort) ---
    x0 = jnp.clip(jnp.floor((mean2d[:, 0] - bbox_half[:, 0]) / ts), 0, ntx - 1)
    x1 = jnp.clip(jnp.floor((mean2d[:, 0] + bbox_half[:, 0]) / ts), 0, ntx - 1)
    y0 = jnp.clip(jnp.floor((mean2d[:, 1] - bbox_half[:, 1]) / ts), 0, nty - 1)
    y1 = jnp.clip(jnp.floor((mean2d[:, 1] + bbox_half[:, 1]) / ts), 0, nty - 1)
    tx0 = x0.astype(jnp.int32)
    ty0 = y0.astype(jnp.int32)
    span_w = (x1 - x0).astype(jnp.int32) + 1
    span_h = (y1 - y0).astype(jnp.int32) + 1
    counts = jnp.where(valid, span_w * span_h, 0)
    # valid-compaction index: the gradient-reduction segment of gaussian i.
    # Valid gaussians always own >= 1 pair (spans are >= 1), so the segment
    # keys that occur form a prefix [0, n_live) as ops/segsum requires.
    vid = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32)) - 1, 0)

    # --- 2. owner of pair j = first g with cum[g] > j = #{g : cum[g] <= j}.
    # Because the queries are just arange(P), that count is the cumsum of a
    # histogram of the cum values — one 1-D scatter-add + one int cumsum.
    cum = jnp.cumsum(counts)  # inclusive
    total = cum[-1]
    offsets = cum - counts  # exclusive
    j = jnp.arange(P, dtype=jnp.int32)
    hist = jnp.zeros((P,), jnp.int32).at[jnp.minimum(cum, P - 1)].add(
        1, mode="drop"
    )
    g = jnp.minimum(jnp.cumsum(hist), N - 1)

    # --- 3. one packed row gather for everything pair expansion needs.
    # Depth keys: positive float32 bitcast to int32 is monotone, so the pair
    # sort's secondary key reproduces an exact per-tile depth order.
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depth, 0.0).astype(jnp.float32), jnp.int32
    )
    packed = jnp.stack(
        [tx0, ty0, span_w, offsets, depth_bits, vid], axis=1
    )  # (N, 6)
    rows = packed[g]  # (P, 6)
    local = j - rows[:, 3]
    lx = local % rows[:, 2]
    ly = local // rows[:, 2]
    tile = (rows[:, 1] + ly) * ntx + (rows[:, 0] + lx)
    pair_valid = j < total
    tile = jnp.where(pair_valid, tile, T).astype(jnp.int32)  # sentinel tail
    key_of_om = rows[:, 5]  # sorted: vid nondecreasing, g nondecreasing

    # --- 4. 2-key sort by (tile, depth); owner id + pair index ride along ---
    tile_s, _, gid_s, om_idx = jax.lax.sort(
        (tile, rows[:, 4], g, j), num_keys=2
    )

    # --- 5. per-tile segments of sorted pair space ---
    tids = jnp.arange(T, dtype=jnp.int32)
    seg_start = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
    seg_end = jnp.searchsorted(tile_s, tids, side="right").astype(jnp.int32)
    seg_len = seg_end - seg_start

    # --- 6. gradient-routing tables (see module docstring) ---
    # slot of tile-sorted pair q (sentinel T*K for padding/truncated pairs),
    # permuted into gaussian-major order with a key sort (sorting
    # (perm, payload) by the unique perm keys IS the inverse permutation,
    # measured ~2x cheaper than the equivalent scatter-set on v5e).
    t_q = jnp.minimum(tile_s, T - 1)
    k_q = j - seg_start[t_q]
    in_table = (tile_s < T) & (k_q < K)
    slot_q = jnp.where(in_table, t_q * K + k_q, T * K).astype(jnp.int32)
    _, slot_of_om = jax.lax.sort((om_idx, slot_q), num_keys=1)
    # segments with surviving pairs form a prefix of [0, n_valid): capacity
    # drops cut the gaussian-major tail (offsets nondecreasing)
    surviving = valid & (offsets < jnp.minimum(total, P))
    n_live = jnp.sum(surviving.astype(jnp.int32))
    key_of_gauss = jnp.where(surviving, vid, -1).astype(jnp.int32)

    dropped = jnp.maximum(total - P, 0).astype(jnp.int32)
    truncated = jnp.sum(jnp.maximum(seg_len - K, 0)).astype(jnp.int32)

    ids = mask = None
    if build_table:
        k = jnp.arange(K, dtype=jnp.int32)
        gather_idx = jnp.minimum(seg_start[:, None] + k[None, :], P - 1)
        ids = gid_s[gather_idx]
        mask = k[None, :] < jnp.minimum(seg_len, K)[:, None]

    return TileBins(
        ids=ids,
        mask=mask,
        num_pairs=total.astype(jnp.int32),
        dropped_pairs=dropped,
        truncated=truncated,
        gid_s=gid_s,
        seg_start=seg_start,
        seg_len=seg_len,
        slot_of_om=slot_of_om,
        key_of_om=key_of_om,
        vid=vid,
        key_of_gauss=key_of_gauss,
        n_live=n_live,
    )
