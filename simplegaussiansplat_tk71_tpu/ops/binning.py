"""Gaussian -> tile binning with static shapes.

The reference rasterizer expands every projected Gaussian's 3-sigma box into an
explicit per-pixel fragment list and sorts fragments by pixel key
(gs_model.py:419-428, uitility.py:336-366). On TPU we instead build, per image,
fixed-capacity *tile-sorted pair space*: for each camera a static list of
``max_pairs`` (gaussian, tile) pairs sorted by (tile, depth), from which the
compositor's per-tile depth lists are contiguous windows.

Pipeline (all static shapes; costs measured on v5e at 1M gaussians / 2.2M
pairs):

  1. per-gaussian covered tile spans straight from the projected boxes —
     gaussian-major, NO global depth argsort (the reference's z-argsort,
     gs_model.py:356-365, is replaced by the pair sort's depth key);
  2+3. owner lookup (pair j -> gaussian g) FUSED into the per-pair
     transport (ops/expand.expand_spans): the count-cumsum columns ride the
     one-hot window and membership (off[g] <= j < cum[g]) is tested
     in-kernel, so no owner array / histogram / P-length cumsum exists;
     window starts come from ~P/256 binary searches on the cumsum. All
     per-pair metadata AND the 9 render-attr columns transport through the
     same one-hot MXU matmul;
  4. one pair sort by (tile id, depth bits) carrying the attr columns and
     the gradient segment key as payloads (bitcast of a positive float is
     monotone; when the tile id fits 13 bits it packs with a quantized
     depth into ONE int32 key — see the in-function comment; 9 extra f32
     payloads cost ~1 ms at 2.5M rows vs ~40 ms for the tile-order row
     gather they replace — sort payloads are dense 1-D columns, while the
     gather reads (N, 9) rows lane-padded 14x, NOTES.md layout tax);
  5. per-tile segment spans via searchsorted on the sorted tile keys
     (~1.6 ms); the compositor reads the sorted attr columns directly
     (ops/rasterize_pallas.pair_attrs_to_table) — no (T, K) id table unless
     ``build_table`` is set for the XLA / tile-sharded paths.

Gradient routing (ops/rasterize_pallas._composite_pairroute_bwd) rides
``key_s`` (the owner's valid-compaction rank per tile-sorted pair, carried
through the same sort): the fused backward emits per-slot gradient rows, the
key table rides row 9 of the forward attr table, and the reduction is one
1-key payload sort + an MXU segment sum (ops/segsum) + a one-hot expansion
(ops/expand) — no scatter-add, no slot->pair gather.

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
    gid_s: Optional[jnp.ndarray]  # (P,) int32 pair owner id, tile-sorted (build_table only)
    seg_start: jnp.ndarray  # (T,) int32 first pair index of tile t
    seg_len: jnp.ndarray  # (T,) int32 true list length (may exceed K)
    # --- sort-carried render attrs + gradient segment key (stop-gradient;
    # grads flow through the rasterizer's custom vjp, not the sort) ---
    attrs_s: Optional[jnp.ndarray]  # (A, P) f32 per-pair attrs, tile-sorted
    key_s: Optional[jnp.ndarray]  # (P,) int32 owner's segment rank, tile-sorted
    # --- gradient routing ---
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
    attrs: jnp.ndarray | None = None,
    expand_transport: bool | None = None,
    cull_alpha_min: float = 0.0,
) -> TileBins:
    """Build tile-sorted pair space (+ optional dense id table) for one camera.

    Args:
      mean2d: (2, N) pixel means; bbox_half: (2, N) half extents
        (component-major, ops/projection layout);
      depth: (N,) camera z (positive where valid); valid: (N,) cull mask.
      img_wh: (width, height) static ints (any size; tile grid is ceil).
      max_pairs: static capacity of the pair list (default 8*N). Keep it AT
        OR JUST UNDER A POWER OF TWO: lax.sort pads its operands to the
        next power of two, so a 2.2M buffer silently sorts 4.19M rows
        (round-5 NOTES — shrinking the bench buffer to 2^21 cut the train
        step 108.8 -> 95.1 ms, entirely in the two pair sorts).
      max_per_tile: static depth-list length K per tile.
      build_table: also gather the (T, K) id table + mask (XLA path).
      attrs: optional (A, N) f32 per-gaussian render attributes to carry
        through the pair expansion + sort (returned tile-sorted as (A, P)
        ``attrs_s``). Treated as constants (stop_gradient): the rasterizer's
        custom vjp owns their gradient.
      expand_transport: route the per-pair transport through the
        ops/expand pallas kernel (default: on TPU) instead of an XLA row
        gather (CPU fallback / interpret tests pass True explicitly).
      cull_alpha_min: exact per-pair tile-intersection culling (needs
        ``attrs``): a (gaussian, tile) pair is dropped when the gaussian
        cannot reach alpha >= cull_alpha_min anywhere in the tile — the
        official-3DGS 1/255 convention, conservative via the conic's
        smallest eigenvalue times the squared euclidean distance to the
        tile rect (a lower bound on the anisotropic quadratic). 0 disables
        (exact 3-sigma-box semantics, like the reference). Culling shrinks
        per-tile depth lists, so max_per_tile (kernel time scales with it)
        can drop; pairs still occupy max_pairs capacity upstream.
    """
    # binning is pure structure — gradients flow through the rasterizer's
    # custom vjp, never through tile assignment / sort keys (and the pallas
    # expand transport has no jvp rule to trace)
    mean2d = jax.lax.stop_gradient(mean2d)
    bbox_half = jax.lax.stop_gradient(bbox_half)
    depth = jax.lax.stop_gradient(depth)

    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx, nty = -(-width // ts), -(-height // ts)  # ceil: odd image sizes OK
    T = ntx * nty
    N = mean2d.shape[1]
    P = max_pairs if max_pairs is not None else 8 * N
    K = max_per_tile

    # --- 1. covered tile spans, gaussian-major (no depth sort) ---
    x0 = jnp.clip(jnp.floor((mean2d[0] - bbox_half[0]) / ts), 0, ntx - 1)
    x1 = jnp.clip(jnp.floor((mean2d[0] + bbox_half[0]) / ts), 0, ntx - 1)
    y0 = jnp.clip(jnp.floor((mean2d[1] - bbox_half[1]) / ts), 0, nty - 1)
    y1 = jnp.clip(jnp.floor((mean2d[1] + bbox_half[1]) / ts), 0, nty - 1)
    # every gaussian owns >= 1 pair: invalid ones get a DUMMY pair that the
    # forced-huge tx0 below routes to the sentinel tile. This keeps the
    # owner sequence g nondecreasing with increments <= 1, which turns the
    # per-pair metadata/attr transport into an ops/expand one-hot window
    # kernel (~3 ms) instead of a wide row gather (a 15-column gather
    # measured 70 ms at 2.2M pairs — 5x the 6-column one, proto_binning).
    tx0 = jnp.where(valid, x0.astype(jnp.int32), jnp.int32(1 << 20))
    ty0 = jnp.where(valid, y0.astype(jnp.int32), 0)
    span_w = jnp.where(valid, (x1 - x0).astype(jnp.int32) + 1, 1)
    span_h = jnp.where(valid, (y1 - y0).astype(jnp.int32) + 1, 1)
    counts = span_w * span_h
    # valid-compaction index: the gradient-reduction segment of gaussian i.
    # Valid gaussians always own >= 1 pair, so the segment keys that occur
    # form a prefix [0, n_live) as ops/segsum requires.
    vid = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32)) - 1, 0)

    # --- 2+3. owner lookup FUSED into the per-pair transport
    # (ops/expand.expand_spans): the exclusive/inclusive count-cumsum
    # columns ride the DMA window and the one-hot membership test
    # off[g] <= j < cum[g] runs in-kernel — no owner array, histogram
    # scatter, or P-length cumsum is materialized. Everything is
    # transported as f32 through the one-hot matmul: small ints (tile
    # coords, spans, gaussian index, vid) are exact below 2^24; the cumsum
    # columns are clamped to P + 1 first (rows whose pairs all overflow the
    # capacity never own an output, so the clamp is semantics-preserving
    # and keeps them f32-exact even when the true total exceeds 2^24);
    # depth rides as raw f32 (exact) and is bitcast to a monotone int32
    # sort key afterwards.
    from simplegaussiansplat_tk71_tpu.ops.expand import expand_spans

    cum = jnp.cumsum(counts)  # inclusive
    total = cum[-1]
    offsets = cum - counts  # exclusive
    j = jnp.arange(P, dtype=jnp.int32)
    assert P < (1 << 24), "offsets must stay f32-exact through ops/expand"
    assert N < (1 << 24), "gaussian index must stay f32-exact"
    cum_c = jnp.minimum(cum, P + 1)
    off_c = jnp.minimum(offsets, P + 1)
    A = 0
    cols = [
        tx0.astype(jnp.float32),
        ty0.astype(jnp.float32),
        span_w.astype(jnp.float32),
        off_c.astype(jnp.float32),
        jnp.maximum(depth, 0.0).astype(jnp.float32),
        vid.astype(jnp.float32),
        cum_c.astype(jnp.float32),
        jnp.arange(N, dtype=jnp.float32),  # gaussian index payload
    ]
    if attrs is not None:
        attrs = jax.lax.stop_gradient(attrs)
        A = attrs.shape[0]
        cols += [attrs[a] for a in range(A)]
    src = jnp.stack(cols, axis=1)  # (N, 8 + A)
    if expand_transport is None:
        expand_transport = jax.default_backend() == "tpu"
    if expand_transport:
        EB = 256
        nb = -(-P // EB)
        starts = jnp.arange(nb, dtype=jnp.int32) * EB
        # owner of output j0 = #{g : cum[g] <= j0}; ~P/EB binary searches
        base = jnp.searchsorted(cum_c, starts, side="right").astype(
            jnp.int32
        )
        # each program's superset window reads EB * inner + 8 rows
        src_p = jnp.pad(src, ((0, EB * 8 + 8), (0, 0)))
        rowsT = expand_spans(src_p, base, P, EB)  # (8+A, P)
        col_p = lambda i: rowsT[i]
    else:
        # CPU fallback: materialize the same membership test as owner array
        # g = cumsum(histogram(cum)) + row gather; unmatched outputs
        # (j >= total) get zero rows exactly like the kernel's no-match
        # columns.
        hist = jnp.zeros((P,), jnp.int32).at[jnp.minimum(cum, P - 1)].add(
            1, mode="drop"
        )
        g = jnp.minimum(jnp.cumsum(hist), N - 1)
        rows = jnp.where((j < total)[:, None], src[g], 0.0)
        col_p = lambda i: rows[:, i]
    # zero (no-match) rows decode to span 0: guard the int div/mod
    span_w_p = jnp.maximum(col_p(2).astype(jnp.int32), 1)
    local = j - col_p(3).astype(jnp.int32)
    lx = local % span_w_p
    ly = local // span_w_p
    tile = (col_p(1).astype(jnp.int32) + ly) * ntx + col_p(0).astype(
        jnp.int32
    ) + lx
    pair_valid = j < total
    keep = pair_valid & (tile < T)
    if cull_alpha_min > 0.0 and attrs is None:
        # never skip the cull silently: the caller must supply the packed
        # attr columns (mean2d/conic/opacity are rows 0..5) or the culled
        # and uncculled paths would composite different pair sets
        raise ValueError("cull_alpha_min > 0 requires attrs")
    if cull_alpha_min > 0.0:
        # conservative reachability: q >= lam_min(conic) * d(rect, mean)^2,
        # keep iff op * exp(-q_lb / 2) could reach cull_alpha_min
        mx, my = col_p(8), col_p(9)
        ca, cb, cc = col_p(10), col_p(11), col_p(12)
        op = col_p(13)
        tx = (col_p(0).astype(jnp.int32) + lx).astype(jnp.float32) * ts
        ty = (col_p(1).astype(jnp.int32) + ly).astype(jnp.float32) * ts
        dx = jnp.clip(mx, tx, tx + ts) - mx
        dy = jnp.clip(my, ty, ty + ts) - my
        d2 = dx * dx + dy * dy
        lam_min = jnp.maximum(
            0.5 * (ca + cc)
            - jnp.sqrt(0.25 * (ca - cc) ** 2 + cb * cb + 1e-30),
            0.0,
        )
        thresh = 2.0 * jnp.log(
            jnp.maximum(op, 1e-30) * (1.0 / cull_alpha_min)
        )
        # the first pair of each gaussian (local == 0) is exempt from the
        # alpha cull: the gradient-routing segment keys must stay gap-free —
        # a surviving gaussian (``surviving`` below) whose every pair is
        # culled would leave a hole in the sorted key sequence, violating
        # ops/segsum's increments<=1 precondition (the pairs it keeps carry
        # ~zero gradients, so this is also quality-neutral). Truncation can
        # still drop that pair past max_per_tile — the routed backward
        # dummy-augments whenever truncated > 0 (rasterize_pallas).
        keep = keep & ((lam_min * d2 <= thresh) | (local == 0))
    tile = jnp.where(keep, tile, T).astype(jnp.int32)
    depth_bits = jax.lax.bitcast_convert_type(col_p(4), jnp.int32)
    key_pair = col_p(5).astype(jnp.int32)

    # --- 4. pair sort by (tile, depth); the segment key and attr columns
    # ride along as payloads (near-free: see module docstring). When the
    # tile id fits 13 bits, tile and a quantized depth PACK into one int32
    # key — the comparator cost scales with key count (2-key sorts measured
    # ~20% slower at 2.2M rows). The shift drops the low tile_bits + 1 bits
    # of the depth, i.e. ties within 2^(tile_bits+1) ulps — worst case
    # 16384 ulps (~0.2% relative) at tile_bits = 13 — composite in
    # arbitrary order, which is quality-neutral and consistent across every
    # path (all share this binning). The owner id rides only when the dense
    # table is built.
    tile_bits = max(int(T).bit_length(), 1)
    packed_key = tile_bits <= 13
    if packed_key:
        dshift = 31 - tile_bits
        key0 = (tile << dshift) | jax.lax.shift_right_logical(
            depth_bits, 32 - dshift
        )
        keys, nk = (key0,), 1
    else:
        keys, nk = (tile, depth_bits), 2
    gid_ops = (col_p(7).astype(jnp.int32),) if build_table else ()
    operands = keys + gid_ops + (key_pair,) + tuple(
        jax.lax.bitcast_convert_type(col_p(8 + a), jnp.int32)
        for a in range(A)
    )
    out = jax.lax.sort(operands, num_keys=nk)
    base_i = nk + len(gid_ops)
    gid_s = out[nk] if build_table else None
    key_s = out[base_i]
    attrs_s = None
    if A:
        attrs_s = jnp.stack(
            [
                jax.lax.bitcast_convert_type(out[base_i + 1 + a], jnp.float32)
                for a in range(A)
            ],
            axis=0,
        )  # (A, P)

    # --- 5. per-tile segments of sorted pair space ---
    tids = jnp.arange(T, dtype=jnp.int32)
    if packed_key:
        # boundaries on the packed key: tile t's range is [t << dshift,
        # (t + 1) << dshift)
        seg_start = jnp.searchsorted(
            out[0], tids << dshift, side="left"
        ).astype(jnp.int32)
        seg_end = jnp.searchsorted(
            out[0], (tids + 1) << dshift, side="left"
        ).astype(jnp.int32)
    else:
        seg_start = jnp.searchsorted(out[0], tids, side="left").astype(
            jnp.int32
        )
        seg_end = jnp.searchsorted(out[0], tids, side="right").astype(
            jnp.int32
        )
    seg_len = seg_end - seg_start

    # --- 6. gradient-routing tables (see module docstring) ---
    # segments with surviving pairs form a prefix of [0, n_valid): capacity
    # drops cut the gaussian-major tail (offsets nondecreasing)
    surviving = valid & (offsets < jnp.minimum(total, P))
    n_live = jnp.sum(surviving.astype(jnp.int32))
    key_of_gauss = jnp.where(surviving, vid, -1).astype(jnp.int32)

    # report REAL pairs: each invalid gaussian holds one sentinel dummy pair
    n_dummy = N - jnp.sum(valid.astype(jnp.int32))
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
        num_pairs=(total - n_dummy).astype(jnp.int32),
        dropped_pairs=dropped,
        truncated=truncated,
        gid_s=gid_s,
        seg_start=seg_start,
        seg_len=seg_len,
        attrs_s=attrs_s,
        key_s=key_s,
        vid=vid,
        key_of_gauss=key_of_gauss,
        n_live=n_live,
    )
