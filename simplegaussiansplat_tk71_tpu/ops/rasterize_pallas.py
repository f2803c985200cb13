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
         (attr-major: lanes = K keeps the HBM buffer unpadded; a (.., K, 16)
         layout pads 16 -> 128 lanes, 8x memory and traffic)
  row 9 of attrs carries the gradient segment key as the FLOAT VALUE
  key + 1 (exact below 2^24; the window kernel's zero fill decodes to key
  -1 = "empty slot"). NEVER encode keys as bitcast int bits: small ints are
  denormal f32 patterns and TPU float ops FLUSH DENORMALS — whether an XLA
  fusion that flushes touches the row is shape-dependent, which silently
  zeroed every key at some image/tile shapes while interpret mode stayed
  exact (root-caused 2026-08-19; see NOTES.md).

The depth-axis exclusive cumprod / suffix cumsum (the reference's thrust
scans, cuda_kernel/grouped_cumprod_forward.cu + the grouped_cumsum flip trick
gs_model.py:716-722) run as MXU work in the single-pass kernels: the cumprod
in log space as strict-triangular matmuls per depth block with a carried
log-transmittance, the suffix sum as the strict-upper-triangular transpose —
the VPU was the bottleneck at ~40 Hillis-Steele ops/element, the MXU does
each scan in 3 bf16 passes (_tri_matmul). The blocked v2 kernels keep the
in-register Hillis-Steele scans (_exclusive_cumprod/_inclusive_cumsum).
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


def _pixel_coords(tid, ntx, ts, pixel_offset):
    """(1, P) pixel-center x and y coords for tile `tid` (row-major pixels)."""
    tile_x = (tid % ntx) * ts
    tile_y = (tid // ntx) * ts
    p = jax.lax.broadcasted_iota(jnp.int32, (1, ts * ts), 1)
    px = (p % ts + tile_x).astype(jnp.float32) + pixel_offset
    py = (p // ts + tile_y).astype(jnp.float32) + pixel_offset
    return px, py


def _gauss_weight(q):
    """exp(-0.5 q) gated to exactly 0 where q < 0.

    A negative quadratic form only happens when the conic is numerically
    non-PSD: ``det = s00*s11 - s01^2 + 1e-6`` (ops/projection.py) cancels
    catastrophically in f32 for huge anisotropic 2-D covariances (entries
    ~1e6 carry ~1e5 of rounding error), flipping the conic's sign. Ungated,
    exp(+big) = inf and the composite's ``t_excl * alpha`` becomes 0 * inf
    = NaN — the r3b quality run lost ~8% of its steps to this (NaN-batch
    skip guard, train/trainer.py). Official 3DGS skips these fragments
    (forward.cu: ``if (power > 0.0f) continue``); the reference crashes and
    retries instead (gs_control.py:241-244). Gating g zeroes the fragment's
    forward contribution AND every analytic gradient (all are proportional
    to g or alpha). The inner maximum keeps exp finite even in the gated
    lanes."""
    return jnp.where(q >= 0.0, jnp.exp(-0.5 * jnp.maximum(q, 0.0)), 0.0)


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
    g = _gauss_weight(q)
    alpha = op * g
    return dx, dy, g, alpha, op


def _depth_block(K):
    """Depth-block size for the MXU-cumsum kernels: the triangular matmul's
    flops grow with D^2 while the carry chain length shrinks with 1/D.
    Largest divisor of K that is <= 256 (any max_per_tile works — e.g. 384
    gets D=192; worst case a prime K runs blockless at D=K... but K is
    always a multiple of 128 in practice). SGS_DEPTH_BLOCK overrides the
    256 ceiling for A/B measurement (tri-scan MXU flops per element scale
    with D; the carry chain + per-block overhead scale with K / D)."""
    cap = int(__import__("os").environ.get("SGS_DEPTH_BLOCK", "256"))
    if K <= cap:
        return K
    for D in range(cap, 0, -1):
        if K % D == 0:
            return D
    return K


def _tri_cumsum_masks(D):
    """Strict lower/upper triangular 0/1 masks (exact in one bf16 pass)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    return (c < r).astype(jnp.float32), (c > r).astype(jnp.float32)


def _tri_matmul(tri, x):
    """tri (D, D) 0/1 mask @ x (D, P) f32, f32-faithful at 3 bf16 passes.

    Mosaic's only precision knobs are DEFAULT (both operands truncated to one
    bf16 pass — 1e-2 relative error, too lossy for log-transmittance sums)
    and HIGHEST (full f32 contraction). The mask operand is EXACT in bf16,
    so splitting only x into three bf16 terms and accumulating three DEFAULT
    matmuls in f32 reproduces the f32 contraction of the mask side at half
    the MXU passes (the bf16x3 trick, done manually because Mosaic has no
    per-operand precision)."""
    x0 = x.astype(jnp.bfloat16)
    r0 = x - x0.astype(jnp.float32)
    x1 = r0.astype(jnp.bfloat16)
    x2 = (r0 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    tri_b = tri.astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(
        tri_b, x0, dims, preferred_element_type=jnp.float32
    )
    acc += jax.lax.dot_general(
        tri_b, x1, dims, preferred_element_type=jnp.float32
    )
    acc += jax.lax.dot_general(
        tri_b, x2, dims, preferred_element_type=jnp.float32
    )
    return acc


def _blk_alphas(blk, px, py):
    """Forward core on one (A, D) depth-block slice: (D, P) dx/dy/alpha."""
    mux = blk[0, :][:, None]
    muy = blk[1, :][:, None]
    ca = blk[2, :][:, None]
    cb = blk[3, :][:, None]
    cc = blk[4, :][:, None]
    op = blk[5, :][:, None]
    dx = px - mux
    dy = py - muy
    q = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
    alpha = op * _gauss_weight(q)
    return dx, dy, ca, cb, cc, op, alpha


# log T below which exp(log T + excl) is EXACTLY 0.0f for every pixel
# (excl <= 0; exp(-120) ~ 8e-53, far under the smallest f32 denormal), so
# skipping the remaining depth blocks is bit-exact, not an approximation.
_LOG_T_DEAD = -120.0


def _forward_kernel(ntx, ts, pixel_offset, tile_block, seg_len_ref,
                    tile_ids_ref, attrs_ref, out_ref):
    # Each program composites ``tile_block`` tiles from one VMEM block:
    # amortizes per-program/DMA overhead (grid T -> T / tile_block).
    # tile_ids (SMEM) maps grid position -> global tile id, so a sharded
    # caller can composite an arbitrary tile subset (parallel/tile_sharding).
    #
    # The exclusive depth cumprod runs in LOG space as a strict-triangular
    # matmul per depth block + a carried log-transmittance: the MXU does the
    # scan (2 bf16x3 matmul passes) instead of a log2(K)-step Hillis-Steele
    # shift/select chain on the VPU (~40 VPU ops/element -> ~8, the kernel
    # was VPU-bound). anti in (0, 1] so log is total; exp underflow to 0 at
    # T < 1e-37 matches the saturated-tile semantics.
    #
    # The depth-block loop is bounded by the tile's true list length
    # (seg_len, SMEM — skips the K-padding tail; the dense table is sized
    # for the worst tile) and exits once every pixel's log-transmittance is
    # below _LOG_T_DEAD. Both bounds are BIT-EXACT skips: slots past
    # seg_len have op == 0, and a dead T exp-underflows to exactly 0
    # (official-3DGS saturation termination, the exact-arithmetic limit of
    # the reference's T != 0 mask, gs_model.py:575-578).
    pid = pl.program_id(0)
    K = attrs_ref.shape[-1]
    D = _depth_block(K)
    P = ts * ts
    tril, _ = _tri_cumsum_masks(D)
    for t in range(tile_block):
        gi = pid * tile_block + t
        px, py = _pixel_coords(tile_ids_ref[gi], ntx, ts, pixel_offset)
        nb = pl.cdiv(jnp.minimum(seg_len_ref[gi], K), D)

        def cond(c):
            b, img, log_carry = c
            return jnp.logical_and(b < nb, jnp.max(log_carry) > _LOG_T_DEAD)

        def body(c):
            b, img, log_carry = c
            start = pl.multiple_of(b * D, D)
            blk = attrs_ref[t, :, pl.ds(start, D)]  # (A, D)
            _, _, _, _, _, _, alpha = _blk_alphas(blk, px, py)
            loganti = jnp.log(jnp.maximum(1.0 - alpha, 1e-37))
            excl = _tri_matmul(tril, loganti)  # (D, P) excl in-block log-T
            t_excl = jnp.exp(excl + log_carry)
            w = t_excl * alpha
            img = img + jax.lax.dot_general(
                blk[6:9, :], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            log_carry = log_carry + excl[D - 1:D, :] + loganti[D - 1:D, :]
            return b + 1, img, log_carry

        _, img, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((3, P), jnp.float32),
             jnp.zeros((1, P), jnp.float32)),
        )
        out_ref[t, :, :] = jnp.pad(img, ((0, 5), (0, 0)))


def _excl_cumprod_mxu(anti, D, tril):
    """Exclusive cumprod over axis 0 via log-space blockwise tri-matmuls."""
    K = anti.shape[0]
    loganti = jnp.log(jnp.maximum(anti, 1e-37))
    parts = []
    carry = jnp.zeros((1, anti.shape[1]), jnp.float32)
    for b in range(K // D):
        lb = loganti[b * D:(b + 1) * D, :]
        e = _tri_matmul(tril, lb) + carry
        parts.append(e)
        carry = e[D - 1:D, :] + lb[D - 1:D, :]
    return jnp.exp(jnp.concatenate(parts, axis=0))


def _suffix_sum_mxu(wk, D, triu):
    """Exclusive suffix sum over axis 0 via blockwise tri-matmuls."""
    K = wk.shape[0]
    parts = [None] * (K // D)
    carry = jnp.zeros((1, wk.shape[1]), jnp.float32)
    for b in reversed(range(K // D)):
        wb = wk[b * D:(b + 1) * D, :]
        s = _tri_matmul(triu, wb) + carry
        parts[b] = s
        carry = s[0:1, :] + wb[0:1, :]
    return jnp.concatenate(parts, axis=0)


# backward scan implementation: 'scan' = in-register Hillis-Steele (both
# scans on the VPU), 'mxu_sfx' = suffix sum on the MXU (cumprod stays a VPU
# scan), 'mxu_both' = suffix AND log-space cumprod on the MXU. Measured on
# v5e at the 1M bench (proto_bwd, TB=4): scan 25.4, mxu_sfx 22.6,
# mxu_both 24.7, and a phase-split all-MXU variant with VMEM scratch 39.4 —
# the single-pass structure over full (K, P) arrays with the suffix sum on
# the MXU wins; env-tunable for re-measurement.
BWD_IMPL = __import__("os").environ.get("SGS_BWD_IMPL", "mxu_sfx")

# backward attribute-gradient reduction: 'vpu' (default) = six lane-
# reduction chains; 'mxu' = the six pixel sums ride ONE ones-vector matmul.
# MEASURED on v5e at the 1M bench (2026-08-21): vpu 95.1 ms/step, mxu
# 113.0 — the mxu idea LOSES ~18 ms. Two reasons, kept here so it is not
# re-attempted: (1) a ones-contraction matmul has a unit output dim, and
# the MXU pads both M and N to 128 — the (6K, P) x (P, 1) "reduction"
# costs ~128x its useful MACs; (2) VPU lane reductions are ~7 shuffle-add
# steps per VREG (not per element), i.e. ~0.4 ops/element — far cheaper
# than the per-element mental model suggests. The env knob remains for
# re-measurement on future hardware.
BWD_REDUCE = __import__("os").environ.get("SGS_BWD_REDUCE", "vpu")


def _moment_grads(blk, m, dx, dy):
    """(6, D) attribute-gradient rows [d mux, d muy, d ca, d cb, d cc, d op]
    with all six pixel sums taken in ONE MXU matmul.

    Σ_p m·dx, m·dy, m·dx², m·dxdy, m·dy² and Σ_p m are the dot of a ones
    row against six stacked (D, P) product arrays — the analytic grads
    (gs_model.py:733-766) are per-slot linear combinations of exactly these
    six sums:
      d mux = ca·Σm dx + cb·Σm dy        d ca = -0.5·Σm dx²
      d muy = cb·Σm dx + cc·Σm dy        d cb = -Σm dxdy
      d op  = Σ g·u = (Σ m)/op           d cc = -0.5·Σm dy²
    (m = op·u·g, so the opacity grad rides the zeroth moment — op is a
    per-slot constant; op == 0 slots have m == 0 and divide to exactly 0.)
    The lane-reduction chains this replaces cost ~7 VPU ops per input
    element each; the matmul costs 6·D·P MACs — noise next to the depth
    scan's 3·D²·P."""
    D, P = m.shape
    mdx = m * dx
    mdy = m * dy
    x = jnp.concatenate(
        [m, mdx, mdy, mdx * dx, mdx * dy, mdy * dy], axis=0
    )  # (6D, P)
    s = jax.lax.dot_general(
        jnp.ones((1, P), jnp.float32), x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (1, 6D)
    s_m = s[:, 0 * D:1 * D]
    s_dx = s[:, 1 * D:2 * D]
    s_dy = s[:, 2 * D:3 * D]
    s_dxx = s[:, 3 * D:4 * D]
    s_dxy = s[:, 4 * D:5 * D]
    s_dyy = s[:, 5 * D:6 * D]
    ca = blk[2:3, :]
    cb = blk[3:4, :]
    cc = blk[4:5, :]
    op = blk[5:6, :]
    return jnp.concatenate(
        [
            ca * s_dx + cb * s_dy,
            cb * s_dx + cc * s_dy,
            -0.5 * s_dxx,
            -s_dxy,
            -0.5 * s_dyy,
            s_m / jnp.maximum(op, 1e-30),
        ],
        axis=0,
    )  # (6, D)

# compact pair-space gradient output (composite_tiles_pallas_bwd_pairs):
# the default since round 2 — the round-1 corruption was two real bugs
# (uninitialized tail lanes + cull-induced key gaps), both fixed; see the
# comment in _composite_pairroute_bwd. SGS_PAIR_SPACE_GRADS=0 falls back to
# the slot-space backward (also used by the depth_block path).
PAIR_SPACE_GRADS = (
    __import__("os").environ.get("SGS_PAIR_SPACE_GRADS", "1") == "1"
)


def _tile_grads(attrs, gimg, px, py, D, tril, triu):
    """Per-tile analytic gradients (9, K) — the reference backward
    (gs_model.py:703-766): recompute alphas, exclusive-cumprod
    transmittance, pixel-grad inner products, exclusive suffix sum,
    analytic grads for mean2d/conic/opacity/color."""
    dx, dy, g, alpha, op = _alphas(attrs, px, py)
    anti = 1.0 - alpha
    if BWD_IMPL == "mxu_both":
        t_excl = _excl_cumprod_mxu(anti, D, tril)
    else:
        t_excl = _exclusive_cumprod(anti)
    col = attrs[6:9, :]  # (3, K)
    # ck(k, p) = <dL/dI(p), col_k>
    ck = jax.lax.dot_general(
        col, gimg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (K, P)
    w = t_excl * alpha
    wk = w * ck
    if BWD_IMPL in ("mxu_sfx", "mxu_both"):
        suffix = _suffix_sum_mxu(wk, D, triu)
    else:
        incl = _inclusive_cumsum(wk)
        suffix = incl[-1:, :] - incl  # exclusive suffix sum S_k
    anti_safe = jnp.maximum(anti, 1e-8)
    u = t_excl * ck - suffix / anti_safe
    valid = op > 0.0
    u = jnp.where(valid, u, 0.0)

    m = op * u * g  # (K, P)
    # dL/dcol_c = sum_p gI_c * T * alpha : (3, K)
    g_col = jax.lax.dot_general(
        gimg, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if BWD_REDUCE == "mxu":
        grads = jnp.concatenate(
            [_moment_grads(attrs, m, dx, dy), g_col], axis=0
        )  # (9, K)
    else:
        ca = attrs[2, :][:, None]
        cb = attrs[3, :][:, None]
        cc = attrs[4, :][:, None]
        g_mux = jnp.sum(m * (ca * dx + cb * dy), axis=1)
        g_muy = jnp.sum(m * (cb * dx + cc * dy), axis=1)
        g_ca = jnp.sum(-0.5 * m * dx * dx, axis=1)
        g_cb = jnp.sum(-m * dx * dy, axis=1)
        g_cc = jnp.sum(-0.5 * m * dy * dy, axis=1)
        g_op = jnp.sum(g * u, axis=1)
        grads = jnp.stack([g_mux, g_muy, g_ca, g_cb, g_cc, g_op], axis=0)
        grads = jnp.concatenate([grads, g_col], axis=0)  # (9, K)
    # zero grads of masked slots — ids point at clamped garbage rows
    valid_k = (attrs[5, :] > 0.0).astype(jnp.float32)[None, :]  # (1, K)
    return grads * valid_k


def _tile_grads_blocked(attrs_ref, at, gimg, px, py, D, triu, lk,
                        tbuf, gbuf, gout, gt):
    """_tile_grads bounded by the tile's true list length + transmittance
    saturation (round-4: the full-K backward computed every padding slot —
    the forward has had both skips since round 2, the backward neither).
    Also the only backward that fits scoped VMEM at large K: the full-K
    kernel keeps ~12 (K, P) temporaries live (73.9M at K=4096 — blew the
    64M limit in the r4 quality run when truncation adaptation doubled K);
    this one keeps two (K, P) scratch buffers + (D, P) block temps.

    Pass A walks depth blocks front-to-back: per-block exclusive cumprod
    (Hillis-Steele within the block, multiplicative carry across blocks,
    linear space — no log/exp) into the (K, P) ``tbuf``/``gbuf`` VMEM
    scratch refs, stopping at ceil(lk / D) blocks or once every pixel's
    carry underflows to exactly 0.0f (the same bit-exact dead-T bound as
    _forward_kernel). Pass B walks the alive blocks back-to-front carrying
    the exclusive suffix sum (MXU strict-upper tri-matmul per block, same
    association as _suffix_sum_mxu) and stores each block's analytic
    gradients into ``gout``. Skipped blocks keep zero gradients — identical
    to what the full-K math produces there (padding slots have op == 0;
    saturated slots have t_excl == 0 AND zero suffix). VPU work scales with
    the alive prefix instead of K (bench avg list occupancy ~0.77,
    saturation cuts more on dense tiles).

    Mosaic has no value-space dynamic_slice/dynamic_update_slice (the first
    device run of a value-carried draft of this kernel failed lowering);
    all block addressing goes through refs with ``pl.ds``:
      attrs_ref[at]: (A, K) attr rows for this tile (``at`` static)
      tbuf/gbuf:     (K, P) VMEM scratch (stale past-block contents from a
                     previous tile are never read: pass B only touches
                     blocks < nb_eff of THIS tile)
      gout[gt]:      (NUM_ATTR_ROWS, K) output ref (gt=None for a 2-D ref);
                     zeroed up front, rows 0..8 hold the gradients
    """
    K = attrs_ref.shape[-1]
    P = px.shape[-1]
    nb = pl.cdiv(jnp.minimum(jnp.maximum(lk, 0), K), D)
    zero16 = jnp.zeros((NUM_ATTR_ROWS, K), jnp.float32)
    if gt is None:
        gout[...] = zero16
    else:
        gout[gt] = zero16

    def _blk(start):
        blk = attrs_ref[at, :, pl.ds(start, D)]  # (A, D)
        mux = blk[0, :][:, None]
        muy = blk[1, :][:, None]
        ca = blk[2, :][:, None]
        cb = blk[3, :][:, None]
        cc = blk[4, :][:, None]
        op = blk[5, :][:, None]
        dx = px - mux
        dy = py - muy
        q = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
        g = _gauss_weight(q)
        return blk, ca, cb, cc, op, dx, dy, g

    def a_cond(c):
        b, tc = c
        return jnp.logical_and(b < nb, jnp.max(tc) > 0.0)

    def a_body(c):
        b, tc = c
        start = pl.multiple_of(b * D, D)
        _, _, _, _, op, _, _, g = _blk(start)
        anti = 1.0 - op * g
        excl = _exclusive_cumprod(anti) * tc  # (D, P) exclusive in-tile T
        tbuf[pl.ds(start, D), :] = excl
        gbuf[pl.ds(start, D), :] = g
        tc = excl[D - 1:D, :] * anti[D - 1:D, :]
        return b + 1, tc

    nb_eff, _ = jax.lax.while_loop(
        a_cond, a_body, (jnp.int32(0), jnp.ones((1, P), jnp.float32))
    )

    def b_cond(c):
        b = c[0]
        return b >= 0

    def b_body(c):
        b, carry = c
        start = pl.multiple_of(b * D, D)
        blk, ca, cb, cc, op, dx, dy, _ = _blk(start)
        g = gbuf[pl.ds(start, D), :]
        t_excl = tbuf[pl.ds(start, D), :]
        alpha = op * g
        ck = jax.lax.dot_general(
            blk[6:9, :], gimg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (D, P)
        w = t_excl * alpha
        wk = w * ck
        suffix = _tri_matmul(triu, wk) + carry
        carry = suffix[0:1, :] + wk[0:1, :]
        anti_safe = jnp.maximum(1.0 - alpha, 1e-8)
        u = t_excl * ck - suffix / anti_safe
        u = jnp.where(op > 0.0, u, 0.0)
        m = op * u * g
        g_col = jax.lax.dot_general(
            gimg, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (3, D)
        if BWD_REDUCE == "mxu":
            gb = jnp.concatenate(
                [_moment_grads(blk, m, dx, dy), g_col], axis=0
            )  # (9, D)
        else:
            g_mux = jnp.sum(m * (ca * dx + cb * dy), axis=1)
            g_muy = jnp.sum(m * (cb * dx + cc * dy), axis=1)
            g_ca = jnp.sum(-0.5 * m * dx * dx, axis=1)
            g_cb = jnp.sum(-m * dx * dy, axis=1)
            g_cc = jnp.sum(-0.5 * m * dy * dy, axis=1)
            g_op = jnp.sum(g * u, axis=1)
            gb = jnp.stack([g_mux, g_muy, g_ca, g_cb, g_cc, g_op], axis=0)
            gb = jnp.concatenate([gb, g_col], axis=0)  # (9, D)
        gb = gb * (blk[5, :] > 0.0).astype(jnp.float32)[None, :]
        gb16 = jnp.pad(gb, ((0, NUM_ATTR_ROWS - 9), (0, 0)))
        if gt is None:
            gout[:, pl.ds(start, D)] = gb16
        else:
            gout[gt, :, pl.ds(start, D)] = gb16
        return b - 1, carry

    jax.lax.while_loop(
        b_cond, b_body, (nb_eff - 1, jnp.zeros((1, P), jnp.float32))
    )


# blocked backward (seg_len + dead-T bounds in the gradient kernels, round
# 4). Device-validated 9/9 device_check configs incl. K2048/K4096
# (grad_worst_rel <= 4.7e-05, 2026-08-21). Unset = AUTO: on from K=4096 up,
# where it is mandatory — the full-K backward keeps ~12 (K, P) temporaries
# live and exceeds the 64M scoped-VMEM limit at K=4096 (73.9M; the r4
# quality run crashed there when truncation adaptation doubled K). Below
# that the full-K kernel fits (~37M at K=2048) and measured FASTER on
# truncation-adapted scenes: adaptation keeps K near the max tile
# occupancy, so seg_len ~ K on the busy tiles and the blocked pass
# structure is overhead without savings (r4 quality run at K=2048, same
# 77k-alive state: 0.039-0.043 s/it blocked vs 0.023-0.024 full-K).
# SGS_BWD_BLOCKED=1/0 forces either path (bench A/Bs, device_check).
# Read at TRACE time so one process can A/B both settings (callers retrace
# per pallas_call).
def _bwd_blocked(K: int):
    v = __import__("os").environ.get("SGS_BWD_BLOCKED", "")
    if v in ("0", "1"):
        return v == "1"
    return K >= 4096


def _backward_kernel(ntx, ts, pixel_offset, tile_block, seg_len_ref, tile_ids_ref, attrs_ref, gimg_ref, grad_ref, *scratch):
    # Single pass per tile over full (K, P) arrays. The phase-split MXU
    # variant measured SLOWER (39 vs 25 ms) despite fewer VPU ops — scratch
    # round-trips and dependent small matmuls stall; see BWD_IMPL above.
    # With SGS_BWD_BLOCKED the call site passes two (K, P) VMEM scratch refs
    # and the blocked path stores gradients straight into grad_ref[t].
    pid = pl.program_id(0)
    K = attrs_ref.shape[-1]
    D = _depth_block(K)
    tril, triu = _tri_cumsum_masks(D)
    for t in range(tile_block):
        gimg = gimg_ref[t, :3, :]  # (3, P)
        gi = pid * tile_block + t
        px, py = _pixel_coords(tile_ids_ref[gi], ntx, ts, pixel_offset)
        if _bwd_blocked(K):
            tbuf, gbuf = scratch
            _tile_grads_blocked(
                attrs_ref, t, gimg, px, py, D, triu, seg_len_ref[gi],
                tbuf, gbuf, grad_ref, t,
            )
        else:
            grads = _tile_grads(attrs_ref[t], gimg, px, py, D, tril, triu)
            grad_ref[t, :, :] = jnp.pad(
                grads, ((0, NUM_ATTR_ROWS - 9), (0, 0))
            )


def _backward_kernel_pairs(ntx, ts, pixel_offset, tile_block, CAP, nprog,
                           slot_start_ref, tile_ids_ref, attrs_ref, gimg_ref,
                           out_ref, stage, pend, sem, *scratch):
    """Backward emitting gradients in COMPACT PAIR SPACE: (16, Pc) columns
    where tile t's in-table slots occupy [slot_start[t], slot_start[t+1])
    (slot_start = cumsum of min(seg_len, K)). Row 9 carries each slot's
    segment key (attr-table row KEY_ROW, a float VALUE — safe through any
    float op). The gradient-routing sort then runs over
    Pc ~ real pairs instead of T * K slots + N dummy rows (the device trace
    showed that sort at 27.7 ms/step — the single largest op).

    Output windows are data-dependent, so the kernel DMAs manually: each
    program stages its tiles' columns at a 128-aligned base via
    positive-shift rolls + lane-mask selects, hands the trailing partial
    chunk to the next program through scratch (consecutive programs abut
    mid-chunk), and writes one aligned (16, CAP) window, one copy in flight
    (consecutive windows overlap at the hand-off chunk)."""
    s = pl.program_id(0)
    K = attrs_ref.shape[-1]
    D = _depth_block(K)
    TB = tile_block
    tril, triu = _tri_cumsum_masks(D)
    slot = jax.lax.rem(s, 2)
    start = slot_start_ref[s * TB]
    end = slot_start_ref[(s + 1) * TB]
    a0 = (start // 128) * 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (NUM_ATTR_ROWS, CAP), 1)
    # merge the previous program's trailing partial chunk (our first chunk);
    # start - a0 < 128, so the mask only reaches the padded pend region
    pend_full = jnp.pad(pend[:, :], ((0, 0), (0, CAP - 128)))
    acc = jnp.where(
        (lane < (start - a0)) & (s > 0),
        pend_full,
        jnp.zeros((NUM_ATTR_ROWS, CAP), jnp.float32),
    )
    for i in range(TB):
        t = s * TB + i
        gimg = gimg_ref[i, :3, :]
        px, py = _pixel_coords(tile_ids_ref[t], ntx, ts, pixel_offset)
        lk = slot_start_ref[t + 1] - slot_start_ref[t]  # min(seg_len, K)
        if _bwd_blocked(K):
            tbuf, gbuf, gout = scratch
            _tile_grads_blocked(
                attrs_ref, i, gimg, px, py, D, triu, lk,
                tbuf, gbuf, gout, None,
            )
            grads = gout[...][:9, :]
        else:
            grads = _tile_grads(attrs_ref[i], gimg, px, py, D, tril, triu)
        # slot key rides as row 9 (bit-exact moves only)
        rows10 = jnp.concatenate([grads, attrs_ref[i, KEY_ROW:KEY_ROW + 1, :]], axis=0)
        rows10 = jnp.pad(
            rows10, ((0, NUM_ATTR_ROWS - 10), (0, CAP - K))
        )
        off = slot_start_ref[t] - a0  # in [0, CAP - K]
        rolled = pltpu.roll(rows10, off, axis=1)
        acc = jnp.where((lane >= off) & (lane < off + lk), rolled, acc)
    # hand the trailing partial chunk to the next program
    e0 = (end // 128) * 128
    tail = pltpu.roll(acc, CAP - (e0 - a0), axis=1)[:, :128]
    pend[:, :] = tail

    # one-in-flight aligned window write (windows overlap at the hand-off)
    stage[slot] = acc

    @pl.when(s > 0)
    def _():
        pltpu.make_async_copy(
            stage.at[1 - slot], out_ref.at[:, pl.ds(0, CAP)], sem
        ).wait()

    copy = pltpu.make_async_copy(
        stage.at[slot], out_ref.at[:, pl.ds(a0, CAP)], sem
    )
    copy.start()

    @pl.when(s == nprog - 1)
    def _():
        copy.wait()


def _forward_kernel_v2(
    ntx, ts, pixel_offset, depth_block, t_eps, seg_len_ref, tile_ids_ref,
    attrs_ref, out_ref,
):
    """Blocked forward with list-length bound and transmittance early-out.

    Processes the depth axis in blocks of ``depth_block``, bounded by the
    tile's true list length (skips the K-padding tail — the dense table is
    sized for the worst tile) and stopping early once every pixel's
    transmittance is below ``t_eps`` (the official-3DGS early termination;
    the reference's T != 0 mask, gs_model.py:575-578, is the eps=0 case).
    """
    pid = pl.program_id(0)
    px, py = _pixel_coords(tile_ids_ref[pid], ntx, ts, pixel_offset)
    Kk = attrs_ref.shape[-1]
    D = depth_block
    nb_used = pl.cdiv(seg_len_ref[pid], D)
    P = px.shape[-1]

    def cond(c):
        kb, T, img = c
        return jnp.logical_and(kb < nb_used, jnp.max(T) > t_eps)

    def body(c):
        kb, T, img = c
        start = pl.multiple_of(kb * D, D)
        blk = attrs_ref[0, :, pl.ds(start, D)]  # (A, D)
        dx = px - blk[0, :][:, None]  # (D, P)
        dy = py - blk[1, :][:, None]
        ca = blk[2, :][:, None]
        cb = blk[3, :][:, None]
        cc = blk[4, :][:, None]
        op = blk[5, :][:, None]
        q = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
        alpha = op * _gauss_weight(q)
        anti = 1.0 - alpha
        excl = _exclusive_cumprod(anti)
        w = (T * excl) * alpha  # (D, P); T is (1, P)
        img = img + jax.lax.dot_general(
            blk[6:9, :], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        T = T * (excl[D - 1 : D, :] * anti[D - 1 : D, :])
        return kb + 1, T, img

    T0 = jnp.ones((1, P), jnp.float32)
    img0 = jnp.zeros((3, P), jnp.float32)
    _, _, img = jax.lax.while_loop(cond, body, (0, T0, img0))
    out_ref[0, :, :] = jnp.pad(img, ((0, 5), (0, 0)))


def _backward_kernel_v2(
    ntx, ts, pixel_offset, depth_block, t_eps,
    seg_len_ref, tile_ids_ref, attrs_ref, gimg_ref, grad_ref, t_entries_ref,
):
    """Blocked backward with the same early-out and per-block recompute.

    Phase 1 replays the forward saving each block's entry transmittance into
    VMEM scratch (the reference's cross-chunk T_min carry,
    gs_model.py:606-615); phase 2 walks the used blocks in reverse carrying
    the exclusive suffix sum (the grad_cumsum_0 carry, gs_model.py:634-643).
    """
    pid = pl.program_id(0)
    px, py = _pixel_coords(tile_ids_ref[pid], ntx, ts, pixel_offset)
    gimg = gimg_ref[0, :3, :]  # (3, P)
    Kk = attrs_ref.shape[-1]
    D = depth_block
    nb_used = pl.cdiv(seg_len_ref[pid], D)
    P = px.shape[-1]

    def block_quants(kb):
        start = pl.multiple_of(kb * D, D)
        blk = attrs_ref[0, :, pl.ds(start, D)]  # (A, D) ref slice
        dx = px - blk[0, :][:, None]
        dy = py - blk[1, :][:, None]
        ca = blk[2, :][:, None]
        cb = blk[3, :][:, None]
        cc = blk[4, :][:, None]
        op = blk[5, :][:, None]
        q = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
        g = _gauss_weight(q)
        alpha = op * g
        return blk, dx, dy, ca, cb, cc, op, g, alpha

    # phase 1: entry transmittance per block + used-block count
    def fcond(c):
        kb, T, _ = c
        return jnp.logical_and(kb < nb_used, jnp.max(T) > t_eps)

    def fbody(c):
        kb, T, used = c
        _, _, _, _, _, _, _, _, alpha = block_quants(kb)
        anti = 1.0 - alpha
        excl = _exclusive_cumprod(anti)
        t_entries_ref[pl.ds(kb, 1), :] = T
        T = T * (excl[D - 1 : D, :] * anti[D - 1 : D, :])
        return kb + 1, T, used + 1

    _, _, used = jax.lax.while_loop(
        fcond, fbody, (0, jnp.ones((1, P), jnp.float32), 0)
    )

    # zero-init output (unused blocks keep zero grads)
    grad_ref[0, :, :] = jnp.zeros((NUM_ATTR_ROWS, Kk), jnp.float32)

    # phase 2: reverse over used blocks with suffix carry
    def bbody(i, carry):
        s_carry = carry  # (1, P) sum of w over blocks AFTER kb
        kb = used - 1 - i
        blk, dx, dy, ca, cb, cc, op, g, alpha = block_quants(kb)
        anti = 1.0 - alpha
        excl = _exclusive_cumprod(anti)
        T_entry = t_entries_ref[pl.ds(kb, 1), :]
        t_excl = T_entry * excl  # global exclusive transmittance in block
        ck = jax.lax.dot_general(
            blk[6:9, :], gimg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (D, P)
        wk = t_excl * alpha * ck
        csum = _inclusive_cumsum(wk)
        total = csum[D - 1 : D, :]
        suffix = (total - csum) + s_carry  # exclusive suffix incl. later blocks
        anti_safe = jnp.maximum(anti, 1e-8)
        u = t_excl * ck - suffix / anti_safe
        valid = op > 0.0
        u = jnp.where(valid, u, 0.0)
        m = op * u * g
        g_col = jax.lax.dot_general(
            gimg, t_excl * alpha, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (3, D)
        if BWD_REDUCE == "mxu":
            grads = jnp.concatenate(
                [_moment_grads(blk, m, dx, dy), g_col], axis=0
            )  # (9, D)
        else:
            g_mux = jnp.sum(m * (ca * dx + cb * dy), axis=1)
            g_muy = jnp.sum(m * (cb * dx + cc * dy), axis=1)
            g_ca = jnp.sum(-0.5 * m * dx * dx, axis=1)
            g_cb = jnp.sum(-m * dx * dy, axis=1)
            g_cc = jnp.sum(-0.5 * m * dy * dy, axis=1)
            g_op = jnp.sum(g * u, axis=1)
            grads = jnp.concatenate(
                [jnp.stack(
                    [g_mux, g_muy, g_ca, g_cb, g_cc, g_op], axis=0
                ), g_col],
                axis=0,
            )  # (9, D)
        valid_k = valid.astype(jnp.float32)[:, 0][None, :]
        grads = grads * valid_k
        start = pl.multiple_of(kb * D, D)
        grad_ref[0, 0:9, pl.ds(start, D)] = grads
        return s_carry + total

    jax.lax.fori_loop(0, used, bbody, jnp.zeros((1, P), jnp.float32))


def _tile_ids_or_arange(tile_ids, T, pad_to):
    if tile_ids is None:
        tile_ids = jnp.arange(T, dtype=jnp.int32)
    if pad_to != T:
        tile_ids = jnp.pad(tile_ids, (0, pad_to - T), mode="edge")
    return tile_ids


def composite_tiles_pallas(
    attrs,
    img_wh,
    tile_size: int,
    pixel_offset: float,
    depth_block: int | None = None,
    t_eps: float = 1e-4,
    seg_len=None,
    tile_block: int | None = None,
    tile_ids=None,
):
    """attrs: (T, A, K) packed per-tile gathered attributes (see module doc).
    Returns (T, P) x 3-channel tile images as (T, 8, P) padded array.
    depth_block=None runs the single-pass exact kernel (tile_block tiles per
    program to amortize per-program overhead); an int selects the blocked
    kernel with transmittance early-out below t_eps. tile_ids (optional,
    (T,) int32) gives the global tile id per row for sharded tile subsets."""
    if tile_block is None:
        # per-program tile batching amortizes grid/DMA overhead; measured
        # optimum on the v5e 1M bench is 4 (SGS_TILE_BLOCK for A/Bs)
        tile_block = int(__import__("os").environ.get("SGS_TILE_BLOCK", "4"))
    T, A, K = attrs.shape
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx = -(-width // ts)
    P = ts * ts

    if depth_block is not None:
        assert K % depth_block == 0, (K, depth_block)
        assert seg_len is not None
        kernel = functools.partial(
            _forward_kernel_v2, ntx, ts, pixel_offset, depth_block, t_eps
        )
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # full (T,) per program
                pl.BlockSpec(memory_space=pltpu.SMEM),  # tile ids
                pl.BlockSpec(
                    (1, A, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        )(seg_len, _tile_ids_or_arange(tile_ids, T, T), attrs)
    TB = tile_block
    T_pad = -(-T // TB) * TB
    if T_pad != T:
        attrs = jnp.pad(attrs, ((0, T_pad - T), (0, 0), (0, 0)))
    if seg_len is None:
        # no list lengths known (id-table path): process all K slots
        seg_len_p = jnp.full((T_pad,), K, jnp.int32)
    else:
        seg_len_p = jnp.pad(seg_len.astype(jnp.int32), (0, T_pad - T))
    kernel = functools.partial(_forward_kernel, ntx, ts, pixel_offset, TB)
    out = pl.pallas_call(
        kernel,
        grid=(T_pad // TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seg lengths
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile ids
            pl.BlockSpec((TB, A, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, 8, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T_pad, 8, P), jnp.float32),
        # the unrolled tile/depth-block loops keep many (D, P) temporaries
        # live on the Mosaic stack — beyond the 16 MB default scoped limit
        compiler_params=pltpu.CompilerParams(
            # 64M covers K <= 8192; the blocked backward's two (K, P)
            # scratch buffers + staging push K=16384 to ~66M (measured
            # compile failure at 65.88M) — v5e VMEM is 128M physical
            vmem_limit_bytes=(100 if K >= 16384 else 64) * 1024 * 1024
        ),
    )(seg_len_p, _tile_ids_or_arange(tile_ids, T, T_pad), attrs)
    return out[:T]


def composite_tiles_pallas_bwd(
    attrs,
    g_tiles,
    img_wh,
    tile_size: int,
    pixel_offset: float,
    depth_block: int | None = None,
    t_eps: float = 1e-4,
    seg_len=None,
    tile_block: int | None = None,
    tile_ids=None,
):
    """g_tiles: (T, 8, P) cotangent of the padded tile images.
    Returns (T, 16, K) packed per-slot gradients (attr-major: lanes are the
    K depth slots — the unpadded HBM layout; rows 0..8 are the used
    channels, sliced out as contiguous (T*K,) columns by the sort-based
    routing)."""
    if tile_block is None:
        # per-program tile batching amortizes grid/DMA overhead; measured
        # optimum on the v5e 1M bench is 4 (SGS_TILE_BLOCK for A/Bs)
        tile_block = int(__import__("os").environ.get("SGS_TILE_BLOCK", "4"))
    T, A, K = attrs.shape
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx = -(-width // ts)
    P = ts * ts

    if depth_block is not None:
        assert K % depth_block == 0, (K, depth_block)
        assert seg_len is not None
        kernel = functools.partial(
            _backward_kernel_v2, ntx, ts, pixel_offset, depth_block, t_eps
        )
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # full (T,) per program
                pl.BlockSpec(memory_space=pltpu.SMEM),  # tile ids
                pl.BlockSpec(
                    (1, A, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 8, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, NUM_ATTR_ROWS, K), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((T, NUM_ATTR_ROWS, K), jnp.float32),
            scratch_shapes=[pltpu.VMEM((K // depth_block, P), jnp.float32)],
        )(seg_len, _tile_ids_or_arange(tile_ids, T, T), attrs, g_tiles)
    TB = tile_block
    T_pad = -(-T // TB) * TB
    if T_pad != T:
        attrs = jnp.pad(attrs, ((0, T_pad - T), (0, 0), (0, 0)))
        g_tiles = jnp.pad(g_tiles, ((0, T_pad - T), (0, 0), (0, 0)))
    if seg_len is None:
        # no list lengths known (id-table path): process all K slots
        seg_len_p = jnp.full((T_pad,), K, jnp.int32)
    else:
        seg_len_p = jnp.pad(seg_len.astype(jnp.int32), (0, T_pad - T))
    kernel = functools.partial(_backward_kernel, ntx, ts, pixel_offset, TB)
    out = pl.pallas_call(
        kernel,
        grid=(T_pad // TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seg lengths
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile ids
            pl.BlockSpec((TB, A, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 8, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, NUM_ATTR_ROWS, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T_pad, NUM_ATTR_ROWS, K), jnp.float32),
        # blocked path: (K, P) transmittance + gauss-weight scratch
        # (_tile_grads_blocked stores gradients straight into the out block)
        scratch_shapes=(
            [pltpu.VMEM((K, P), jnp.float32)] * 2 if _bwd_blocked(K) else []
        ),
        compiler_params=pltpu.CompilerParams(
            # 64M covers K <= 8192; the blocked backward's two (K, P)
            # scratch buffers + staging push K=16384 to ~66M (measured
            # compile failure at 65.88M) — v5e VMEM is 128M physical
            vmem_limit_bytes=(100 if K >= 16384 else 64) * 1024 * 1024
        ),
    )(seg_len_p, _tile_ids_or_arange(tile_ids, T, T_pad), attrs, g_tiles)
    return out[:T]


def composite_tiles_pallas_bwd_pairs(
    attrs,
    g_tiles,
    img_wh,
    tile_size: int,
    pixel_offset: float,
    seg_len,
    pc: int,
    tile_block: int | None = None,
    tile_ids=None,
):
    """Backward with COMPACT PAIR-SPACE output (see _backward_kernel_pairs):
    returns (16, pc) columns — rows 0..8 per-slot gradients, row 9 the
    float(key + 1) segment key — where tile t's in-table slots occupy
    [slot_start[t], slot_start[t+1]), slot_start = cumsum(min(seg_len, K)).
    ``pc`` must statically bound sum(min(seg_len, K)) (min(max_pairs, T*K))."""
    if tile_block is None:
        # per-program tile batching amortizes grid/DMA overhead; measured
        # optimum on the v5e 1M bench is 4 (SGS_TILE_BLOCK for A/Bs)
        tile_block = int(__import__("os").environ.get("SGS_TILE_BLOCK", "4"))
    T, A, K = attrs.shape
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx = -(-width // ts)
    P = ts * ts
    TB = tile_block
    T_pad = -(-T // TB) * TB
    if T_pad != T:
        attrs = jnp.pad(attrs, ((0, T_pad - T), (0, 0), (0, 0)))
        g_tiles = jnp.pad(g_tiles, ((0, T_pad - T), (0, 0), (0, 0)))
        seg_len = jnp.pad(seg_len, (0, T_pad - T))
    lk = jnp.minimum(seg_len, K).astype(jnp.int32)
    slot_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lk).astype(jnp.int32)]
    )  # (T_pad + 1,)
    CAP = TB * K + 128
    nprog = T_pad // TB
    pc_buf = -(-pc // 128) * 128 + CAP + 128
    kernel = functools.partial(
        _backward_kernel_pairs, ntx, ts, pixel_offset, TB, CAP, nprog
    )
    out = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # slot_start
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile ids
            pl.BlockSpec((TB, A, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 8, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # manual window DMA
        out_shape=jax.ShapeDtypeStruct((NUM_ATTR_ROWS, pc_buf), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_ATTR_ROWS, CAP), jnp.float32),  # dbl-buffered
            pltpu.VMEM((NUM_ATTR_ROWS, 128), jnp.float32),  # hand-off chunk
            pltpu.SemaphoreType.DMA,
        ] + (
            # blocked path: (K, P) transmittance/gauss scratch + a
            # (16, K) staging block for the per-tile gradients
            [
                pltpu.VMEM((K, P), jnp.float32),
                pltpu.VMEM((K, P), jnp.float32),
                pltpu.VMEM((NUM_ATTR_ROWS, K), jnp.float32),
            ]
            if _bwd_blocked(K)
            else []
        ),
        compiler_params=pltpu.CompilerParams(
            # 64M covers K <= 8192; the blocked backward's two (K, P)
            # scratch buffers + staging push K=16384 to ~66M (measured
            # compile failure at 65.88M) — v5e VMEM is 128M physical
            vmem_limit_bytes=(100 if K >= 16384 else 64) * 1024 * 1024
        ),
    )(slot_start, _tile_ids_or_arange(tile_ids, T, T_pad), attrs, g_tiles)
    return out[:, :pc]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _composite_pallas(attrs, seg_len, tile_ids, img_wh, tile_size, pixel_offset, depth_block, t_eps):
    return composite_tiles_pallas(
        attrs, img_wh, tile_size, pixel_offset, depth_block, t_eps, seg_len,
        tile_ids=tile_ids,
    )


def _composite_pallas_fwd(attrs, seg_len, tile_ids, img_wh, tile_size, pixel_offset, depth_block, t_eps):
    out = composite_tiles_pallas(
        attrs, img_wh, tile_size, pixel_offset, depth_block, t_eps, seg_len,
        tile_ids=tile_ids,
    )
    # chunk-recompute checkpointing: residual = inputs only (same policy as
    # the XLA path / reference gs_model.py:799-803)
    return out, (attrs, seg_len, tile_ids)


def _composite_pallas_bwd(
    img_wh, tile_size, pixel_offset, depth_block, t_eps, res, g_tiles
):
    attrs, seg_len, tile_ids = res
    g_attrs = composite_tiles_pallas_bwd(
        attrs, g_tiles, img_wh, tile_size, pixel_offset, depth_block, t_eps,
        seg_len, tile_ids=tile_ids,
    )
    return (g_attrs, None, None)  # same (T, 16, K) layout as attrs


_composite_pallas.defvjp(_composite_pallas_fwd, _composite_pallas_bwd)


def _window_table_kernel(K, seg_start_ref, seg_len_ref, src_ref, out_ref,
                         scratch, sem):
    """Slice one tile's (A, K) attr block out of tile-sorted pair space.

    Pair-space windows start at arbitrary offsets, but Mosaic DMA lane
    slices must be 128-aligned — so read the 128-aligned superset window
    and rotate in-register. pltpu.roll requires a NONNEGATIVE dynamic
    shift: a traced negative shift compiles but returns wrong lanes
    (observed on v5e), hence the (K + 128) - r form.
    """
    t = pl.program_id(0)
    start = seg_start_ref[t]
    a0 = (start // 128) * 128
    r = start - a0
    W = _window_lanes(K)
    copy = pltpu.make_async_copy(src_ref.at[:, pl.ds(a0, W)], scratch, sem)
    copy.start()
    copy.wait()
    win = scratch[:, :]  # (A, W)
    shifted = pltpu.roll(win, W - r, axis=1)[:, :K]
    length = jnp.minimum(seg_len_ref[t], K)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NUM_ATTR_ROWS, K), 1)
    out_ref[0] = jnp.where(lane < length, shifted, 0.0)


def _window_lanes(K):
    """DMA window size: K rounded up to the 128-lane tiling, plus one extra
    128 so the aligned-floor read still covers [start, start + K)."""
    return -(-K // 128) * 128 + 128


def pair_attrs_to_table(attrs_pair, seg_start, seg_len, K):
    """(A, Pa) tile-sorted pair attrs -> (T, A, K) per-tile table.

    attrs_pair must be lane-padded so every window read
    [128-floor(seg_start[t]), +K+128) is in bounds, i.e. Pa >= P + K + 128
    rounded up to 128 (pad value irrelevant: slots beyond the tile's true
    length are zeroed, which the compositors treat as invalid via op == 0).
    Replaces the (T, K) id-table gather + (T*K, 9) row gather chain
    (measured 18 + 20 ms at 2.56M slots on v5e) with one pair-space row
    gather + ~2 ms of DMA."""
    T = seg_start.shape[0]
    kernel = functools.partial(_window_table_kernel, K)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, NUM_ATTR_ROWS, K), lambda t: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((T, NUM_ATTR_ROWS, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NUM_ATTR_ROWS, _window_lanes(K)), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(seg_start, seg_len, attrs_pair)


@jax.custom_vjp
def _gather_rows(packed, ids):
    """packed[ids] whose transpose scatters column-wise.

    XLA transposes a row gather into one row-wise scatter-add (slice size 9),
    measured 289 ms at 2.56M slots on v5e; nine 1-D scatter-adds measure
    183 ms. Forward stays the fast row gather.
    """
    return packed[ids]


def _gather_rows_fwd(packed, ids):
    return packed[ids], (ids, packed.shape[0])


def _gather_rows_bwd(res, g):
    ids, n = res
    flat_ids = ids.reshape(-1)
    gf = g.reshape(-1, g.shape[-1])
    cols = [
        jnp.zeros((n,), gf.dtype).at[flat_ids].add(gf[:, c])
        for c in range(g.shape[-1])
    ]
    return jnp.stack(cols, axis=1), None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _slot_attrs(packed, ids, mask):
    """(N, 9) packed rows -> (T, 16, K) kernel attrs with slot masking."""
    attrs_tk = _gather_rows(packed, ids)  # (T, K, 9)
    attrs_tk = attrs_tk.at[:, :, 5].set(
        jnp.where(mask, attrs_tk[:, :, 5], 0.0)
    )
    attrs = jnp.swapaxes(attrs_tk, 1, 2)  # (T, 9, K)
    return jnp.pad(attrs, ((0, 0), (0, NUM_ATTR_ROWS - 9), (0, 0)))


KEY_ROW = 9  # attr-table row carrying float(segment key + 1)


def _pair_table(attrs_s, key_s, seg_start, seg_len, K):
    """Window-slice sort-carried pair attrs into the (T, A, K) kernel table.

    attrs_s: (9, P) tile-sorted attr columns (carried through the binning
    sort — no tile-order row gather, see ops/binning); key_s: (P,) int32
    segment key per sorted pair, encoded into row KEY_ROW as the float
    VALUE key + 1 (exact below 2^24, and a NORMAL float — bitcast int bits
    are denormals that TPU float ops flush to zero, shape-dependently) so
    the window kernel's zero fill decodes to -1."""
    A, P = attrs_s.shape
    enc = (key_s + 1).astype(jnp.float32)[None]
    ap = jnp.concatenate([attrs_s, enc], axis=0)  # (A + 1, P)
    Pa = -(-P // 128) * 128 + _window_lanes(K)
    ap = jnp.pad(ap, ((0, NUM_ATTR_ROWS - ap.shape[0]), (0, Pa - P)))
    return pair_attrs_to_table(ap, seg_start, seg_len, K)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15)
)
def _composite_pairroute(
    packed, attrs_s, key_s, seg_start, seg_len, vid, key_of_gauss, tile_ids,
    K, pc, img_wh, tile_size, pixel_offset, depth_block, t_eps, sliced,
):
    """tile_ids: None for the full tile grid, else (Ts,) global tile ids of
    a contiguous slice (seg_start/seg_len must be sliced to match: they are
    absolute offsets into the full tile-sorted pair arrays, so the window
    table build works unchanged). ``sliced`` (static) forces the
    dummy-augmented gradient reduction: a slice's pairs cover only a subset
    of the surviving segments, so the lean gap-free-keys invariant does not
    hold."""
    attrs = _pair_table(attrs_s, key_s, seg_start, seg_len, K)
    seg_len_c = jnp.minimum(seg_len, K)
    return composite_tiles_pallas(
        attrs, img_wh, tile_size, pixel_offset, depth_block, t_eps, seg_len_c,
        tile_ids=tile_ids,
    )


def _composite_pairroute_fwd(
    packed, attrs_s, key_s, seg_start, seg_len, vid, key_of_gauss, tile_ids,
    K, pc, img_wh, tile_size, pixel_offset, depth_block, t_eps, sliced,
):
    # packed is numerically identical to the sort-transported attrs_s and is
    # unused in the forward — it exists as the differentiable anchor: the
    # backward returns d/d(packed) and autodiff chains it through the
    # projection math, while attrs_s/key_s are stop-gradient'd in binning.
    attrs = _pair_table(attrs_s, key_s, seg_start, seg_len, K)
    seg_len_c = jnp.minimum(seg_len, K)
    out = composite_tiles_pallas(
        attrs, img_wh, tile_size, pixel_offset, depth_block, t_eps, seg_len_c,
        tile_ids=tile_ids,
    )
    # save the windowed attrs (the kernel input) rather than rebuilding in
    # backward; row KEY_ROW doubles as the per-slot segment-key table
    res = (attrs, seg_len, vid, key_of_gauss, tile_ids)
    return out, res


_EXPAND_BLOCK = 256  # one-hot matmul flops scale with the block size


def _composite_pairroute_bwd(
    K, pc, img_wh, tile_size, pixel_offset, depth_block, t_eps, sliced,
    res, g_tiles,
):
    """Route per-pair kernel gradients to per-gaussian rows with one
    payload-carrying sort and two MXU kernels (no scatter-add, no row
    gathers — XLA random row gathers are issue-bound at ~45 ms / 2.5M rows,
    and (rows, 9) buffers pad 14x; sort payloads are dense 1-D columns):

      compact pair-space grads + keys (composite_tiles_pallas_bwd_pairs)
      --1-key lax.sort--> key-sorted gradient columns
      --sorted-key segment sum (ops/segsum, column layout)--> segment sums
      --sorted-key expansion (ops/expand)--> per-gaussian rows

    ops/segsum needs gap-free sorted keys (every segment in [0, n_live)
    present). With zero per-tile truncation every surviving pair is
    in-table, so compact pair space covers every segment and the sort runs
    LEAN over ~real-pair rows (the device trace showed the old
    T*K-slots + N-dummies sort at 27.7 ms/step — the single largest op).
    When truncation drops a segment's every pair, a lax.cond switches to
    the dummy-augmented sort (one zero row per surviving segment). Unused
    lanes decode to key -1 and remap to the pad segment N-1 (zero rows,
    merge-safe). (tests/test_pair_route checks grads against the XLA path.)
    """
    from simplegaussiansplat_tk71_tpu.ops.expand import expand_rows
    from simplegaussiansplat_tk71_tpu.ops.segsum import segment_sum_sorted

    attrs, seg_len, vid, key_of_gauss, tile_ids = res
    N = vid.shape[0]
    dummy_keys = jnp.where(key_of_gauss >= 0, key_of_gauss, N - 1)
    zeros_n = jnp.zeros((N,), jnp.float32)

    if depth_block is None and PAIR_SPACE_GRADS:
        # Compact pair-space path: ~13 ms/step faster at the 1M bench (lean
        # sort over real pairs instead of T*K slots + N dummies). The round-1
        # device corruption had two causes, both fixed:
        #   1. the kernel's manual window DMAs only cover
        #      [0, sum(min(seg_len, K))) — lanes past that are UNINITIALIZED
        #      HBM (garbage keys/grads; interpret mode zero-fills, which is
        #      why it stayed exact). Masked below via the true pair count.
        #   2. cull_alpha_min could cull every pair of a surviving segment,
        #      leaving a key gap that violates ops/segsum's increments<=1
        #      precondition — fixed structurally in ops/binning (the first
        #      pair of each gaussian is cull-exempt), so only truncation can
        #      now orphan a segment, and that triggers the dummied branch.
        pair_grads = composite_tiles_pallas_bwd_pairs(
            attrs, g_tiles, img_wh, tile_size, pixel_offset, seg_len, pc,
            tile_ids=tile_ids,
        )  # (16, pc): rows 0..8 grads, row 9 keys
        total = jnp.sum(jnp.minimum(seg_len, K))
        lane_ok = jnp.arange(pc, dtype=jnp.int32) < total
        keys_pc = pair_grads[KEY_ROW].astype(jnp.int32) - 1
        keys_ok = lane_ok & (keys_pc >= 0) & (keys_pc < N)
        # masked lanes -> pad segment N-1 with ZERO rows (merge-safe even
        # when N-1 is a live segment)
        keys = jnp.where(keys_ok, keys_pc, N - 1)
        cols = tuple(
            jnp.where(keys_ok, pair_grads[a], 0.0) for a in range(9)
        )
        # a tile SLICE sees only a subset of segments -> keys have gaps;
        # the dummy-augmented reduction restores the invariant
        lean_ok = not sliced
    else:
        # slot-space grads + dummy-augmented reduction (always correct)
        seg_len_c = jnp.minimum(seg_len, K)
        slot_grads = composite_tiles_pallas_bwd(
            attrs, g_tiles, img_wh, tile_size, pixel_offset, depth_block,
            t_eps, seg_len_c, tile_ids=tile_ids,
        )  # (T, 16, K) attr-major
        T, _, Kk = slot_grads.shape
        keys_slot = (
            attrs[:, KEY_ROW, :].astype(jnp.int32) - 1
        ).reshape(T * Kk)
        keys = jnp.where(keys_slot < 0, N - 1, keys_slot)
        cols = tuple(slot_grads[:, a, :].reshape(T * Kk) for a in range(9))
        lean_ok = False

    def _reduce(keys, cols):
        srt = jax.lax.sort((keys,) + cols, num_keys=1)
        vals_T = jnp.stack(srt[1:], axis=0)
        return segment_sum_sorted(
            vals_T, srt[0], N, raw=True, cols_layout=True
        )

    def _reduce_dummied(args):
        k, c = args[0], args[1:]
        return _reduce(
            jnp.concatenate([k, dummy_keys]),
            tuple(jnp.concatenate([x, zeros_n]) for x in c),
        )

    if lean_ok:
        truncation = jnp.sum(jnp.maximum(seg_len - K, 0)) > 0
        sums_raw = jax.lax.cond(
            truncation,
            _reduce_dummied,
            lambda args: _reduce(args[0], args[1:]),
            (keys,) + cols,
        )
    else:
        sums_raw = _reduce_dummied((keys,) + cols)
    nb = -(-N // _EXPAND_BLOCK)
    base = jnp.pad(vid, (0, nb * _EXPAND_BLOCK - N), mode="edge")[
        ::_EXPAND_BLOCK
    ]
    g_packed = expand_rows(
        sums_raw, key_of_gauss, base, _EXPAND_BLOCK, out_cols=9,
        cols_layout=True,
    )  # (9, N) — matches the component-major packed anchor
    # attrs_s/key_s are sort transports of stop-gradient values: None
    # (symbolic zero) cotangents; trailing None = tile_ids (int slice map)
    return (g_packed, None, None, None, None, None, None, None)


_composite_pairroute.defvjp(_composite_pairroute_fwd, _composite_pairroute_bwd)


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
    depth_block: int | None = None,
    t_eps: float = 1e-4,
    route=None,
    max_per_tile: int | None = None,
):
    """Drop-in Pallas replacement for ops.rasterize.rasterize_tiles.

    Without ``route``, per-tile attributes come from one XLA row-gather of
    the (T, K) id table and gradients flow through that gather's
    scatter-add transpose; with ``route`` (a TileBins from ops.binning
    built with ``attrs`` — the sort-carried attr columns — and possibly no
    id table: pass ``max_per_tile``) attributes are windowed straight out
    of tile-sorted pair space (pair_attrs_to_table) and the backward uses
    the sort-based routing of _composite_pairroute_bwd instead.
    """
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = tile_size
    ntx = -(-width // ts)
    nty = -(-height // ts)
    T = ntx * nty
    P = ts * ts

    packed = jnp.concatenate(
        [mean2d, conic, opacity[None], color], axis=0
    )  # (9, N) component-major (dense; (N, 9) pads its lanes 14x)

    if route is not None:
        assert route.seg_start.shape[0] == T
        assert route.attrs_s is not None, "route needs binning(attrs=packed)"
        K = route.ids.shape[1] if route.ids is not None else max_per_tile
        assert K is not None, "max_per_tile required when route has no table"
        pc = min(route.key_s.shape[0], T * K)
        out = _composite_pairroute(
            packed, route.attrs_s, route.key_s, route.seg_start,
            route.seg_len, route.vid, route.key_of_gauss, None,
            K, pc, img_wh, ts, pixel_offset, depth_block, t_eps, False,
        )
    else:
        assert ids.shape[0] == T
        attrs = _slot_attrs(jnp.swapaxes(packed, 0, 1), ids, mask)
        seg_len = jnp.sum(mask, axis=1).astype(jnp.int32)
        out = _composite_pallas(
            attrs, seg_len, None, img_wh, ts, pixel_offset, depth_block, t_eps
        )
    tile_imgs = jnp.swapaxes(out[:, :3, :], 1, 2)  # (T, P, 3)
    image = tile_imgs.reshape(nty, ntx, ts, ts, 3).transpose(0, 2, 1, 3, 4)
    return image.reshape(nty * ts, ntx * ts, 3)[:height, :width]


def rasterize_tile_block_pallas(
    ids,
    mask,
    mean2d,
    conic,
    color,
    opacity,
    tile_idx,
    img_wh,
    tile_size: int = 16,
    pixel_offset: float = 0.5,
    depth_block: int | None = None,
    t_eps: float = 1e-4,
):
    """Composite an arbitrary subset of tiles with the fused kernels.

    Pallas counterpart of ops.rasterize.rasterize_tile_block, used by the
    tile-sharded multi-chip path (parallel/tile_sharding.py): each chip
    composites only its own contiguous tile slice. tile_idx: (Ts,) int32
    global tile ids. Returns (Ts, ts, ts, 3)."""
    ts = tile_size
    packed = jnp.stack(
        [mean2d[0], mean2d[1], conic[0], conic[1], conic[2], opacity,
         color[0], color[1], color[2]], axis=1
    )  # (N, 9) rows for the id-table gather
    attrs = _slot_attrs(packed, ids, mask)
    seg_len = jnp.sum(mask, axis=1).astype(jnp.int32)
    out = _composite_pallas(
        attrs, seg_len, tile_idx.astype(jnp.int32), img_wh, ts, pixel_offset,
        depth_block, t_eps,
    )
    return jnp.swapaxes(out[:, :3, :], 1, 2).reshape(-1, ts, ts, 3)


def rasterize_tile_block_pallas_routed(
    route,
    mean2d,
    conic,
    color,
    opacity,
    tile_idx,
    img_wh,
    tile_size: int = 16,
    pixel_offset: float = 0.5,
    depth_block: int | None = None,
    t_eps: float = 1e-4,
    max_per_tile: int | None = None,
):
    """Routed pair-space compositor for a contiguous tile slice.

    The fast path of the 2-D gauss-sharded layout (parallel/gauss_sharding):
    binning is tile-sorted, so a chip's tile range is a contiguous pair
    window — slice seg_start/seg_len (absolute offsets into the full pair
    arrays) and run the same windowed-DMA kernels as the single-chip routed
    path. Gradients route per-pair -> per-gaussian with the always-correct
    dummy-augmented reduction (a slice's pairs cover only a subset of the
    surviving segments). route: TileBins from bin_gaussians(attrs=packed,
    build_table=False). tile_idx: (Ts,) int32 contiguous global tile ids
    (clamped duplicates at the end are fine: their cotangents are zero).
    Returns (Ts, ts, ts, 3)."""
    ts = tile_size
    assert route.attrs_s is not None, "route needs binning(attrs=packed)"
    K = route.ids.shape[1] if route.ids is not None else max_per_tile
    assert K is not None, "max_per_tile required when route has no table"
    packed = jnp.concatenate(
        [mean2d, conic, opacity[None], color], axis=0
    )  # (9, N) component-major
    tile_idx = tile_idx.astype(jnp.int32)
    Ts = tile_idx.shape[0]
    seg_start = route.seg_start[tile_idx]
    seg_len = route.seg_len[tile_idx]
    # clamped duplicates (grid padding on the last chip) render empty: the
    # compact backward's pc bound assumes each pair window appears ONCE
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), tile_idx[1:] == tile_idx[:-1]]
    )
    seg_len = jnp.where(dup, 0, seg_len)
    pc = min(route.key_s.shape[0], Ts * K)
    out = _composite_pairroute(
        packed, route.attrs_s, route.key_s, seg_start, seg_len,
        route.vid, route.key_of_gauss, tile_idx,
        K, pc, img_wh, ts, pixel_offset, depth_block, t_eps, True,
    )
    return jnp.swapaxes(out[:, :3, :], 1, 2).reshape(-1, ts, ts, 3)
