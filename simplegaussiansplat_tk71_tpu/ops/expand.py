"""Sorted-key row expansion as Pallas TPU kernels.

``expand_rows(src, keys, base)`` computes ``out[j] = src[keys[j]]`` (zero row
where ``keys[j] < 0``) for *locality-bounded* keys: within every block of B
consecutive outputs, all non-negative keys lie in ``[base[b], base[b] + B)``.
Nondecreasing keys with increments <= 1 (segment ranks from a valid-compaction
cumsum, ops/binning) satisfy this with ``base[b] = clean_keys[b * B]``.

``expand_spans(src, base, P)`` fuses the owner lookup into the expansion:
``out[:, j] = src[g(j)]`` where g(j) is the unique row whose [off, cum) span
contains j (ops/binning pair expansion) — the membership test runs on the
count-cumsum columns riding the window, so no owner array is materialized.

Why: an XLA row gather is issue-rate bound on TPU (~37 ms for 1M x 36 B rows
at bench scale, independent of locality). With the window bound, each output
block needs only one contiguous source window — a row-offset DMA (row offsets
need no 128-lane alignment) — and the in-window routing is a one-hot matmul
on the MXU, the transpose of the ops/segsum reduction:

    out[j, c] = sum_w [keys[j] - base == w] * window[w, c]

Each program consumes ``inner`` consecutive blocks from ONE superset window
DMA (per-program grid/DMA overhead was the dominant cost at one block per
program: 17 ms -> ~5 ms for the 2.5M-pair transport), sub-sliced at dynamic
sublane offsets (base[bi] - base[first]); windows are double-buffered so the
next program's DMA rides under this one's matmuls.

Used by ops/binning (pair expansion transport) and the gradient-routing
backward (ops/rasterize_pallas) to spread per-segment gradient sums back to
per-gaussian rows, replacing the reference's scatter_reduce-to-Gaussians
(gs_model.py:776-783).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def onehot_matmul(data, onehot, dims, transpose=False):
    """data (f32) contracted with a 0/1 ``onehot`` mask, f32-faithful at 3
    bf16 MXU passes.

    Mosaic has no per-operand dot precision — only DEFAULT (both operands
    one bf16 pass; rounds the routed f32 values to ~3 digits) and HIGHEST
    (full f32 contraction, ~2x the passes). The mask side is EXACT in bf16,
    so split only ``data`` into three bf16 terms and accumulate three
    DEFAULT matmuls in f32: exactly the f32 values routed by the mask.
    ``dims`` are dot_general dimension_numbers for (data, onehot); pass
    ``transpose=True`` for (onehot, data) operand order."""
    d0 = data.astype(jnp.bfloat16)
    r0 = data - d0.astype(jnp.float32)
    d1 = r0.astype(jnp.bfloat16)
    d2 = (r0 - d1.astype(jnp.float32)).astype(jnp.bfloat16)
    oh = onehot.astype(jnp.bfloat16)
    acc = None
    for dk in (d0, d1, d2):
        ops = (oh, dk) if transpose else (dk, oh)
        y = jax.lax.dot_general(
            *ops, dims, preferred_element_type=jnp.float32
        )
        acc = y if acc is None else acc + y
    return acc


def _expand_kernel(B, C, inner, nprog, cols_out, base_ref, keys_ref, src_ref,
                   out_ref, stage, sem):
    s = pl.program_id(0)
    slot = jax.lax.rem(s, 2)
    GW = inner * B  # clean keys advance <= B per block => window covers all

    @pl.when(s == 0)
    def _():
        pltpu.make_async_copy(
            src_ref.at[pl.ds(base_ref[0], GW), :], stage.at[0], sem.at[0]
        ).start()

    # prefetch the next program's window while this one computes
    @pl.when(s + 1 < nprog)
    def _():
        nxt = jax.lax.rem(s + 1, 2)
        pltpu.make_async_copy(
            src_ref.at[pl.ds(base_ref[(s + 1) * inner], GW), :],
            stage.at[nxt], sem.at[nxt],
        ).start()

    pltpu.make_async_copy(
        src_ref.at[pl.ds(base_ref[s * inner], GW), :], stage.at[slot],
        sem.at[slot],
    ).wait()
    win0 = base_ref[s * inner]
    for i in range(inner):
        keys = keys_ref[i, :]  # (B,) this inner block's keys
        rel = base_ref[s * inner + i] - win0  # in [0, (inner-1)*B]
        sub = stage[slot, pl.ds(rel, B), :]  # (B, 128)
        local = (keys - base_ref[s * inner + i])[None, :]  # (1, B); mask < 0
        w = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        onehot = (w == local).astype(jnp.float32)  # [src row w, out row j]
        # windows may overrun the source's live prefix into uninitialized
        # rows (e.g. ops/segsum raw output); 0 * NaN = NaN would poison the
        # matmul, so zero non-finite lanes
        sub = jnp.where(jnp.isfinite(sub), sub, 0.0)
        if cols_out:
            # same contraction with operands swapped -> transposed result,
            # so the column-major output needs no in-kernel relayout
            res = onehot_matmul(
                sub, onehot, (((0,), (0,)), ((), ()))
            )  # (128, B)
            out_ref[:, i * B:(i + 1) * B] = res[:C, :]
        else:
            res = onehot_matmul(
                sub, onehot, (((0,), (0,)), ((), ())), transpose=True
            )  # (B, 128)
            out_ref[i * B:(i + 1) * B, :] = res[:, :C]


def expand_rows(
    src: jnp.ndarray,
    keys: jnp.ndarray,
    base: jnp.ndarray,
    block: int = 256,
    out_cols: int | None = None,
    cols_layout: bool = False,
    inner: int = 8,
) -> jnp.ndarray:
    """Row expansion ``src[keys]`` with zero rows where ``keys < 0``.

    Args:
      src: (S, C) float32 source rows; S must be >= max(base) + block * inner
        (pad the source — each program's superset window read
        [base[s * inner], + block * inner) must be in bounds; padding rows
        are never routed to the output). Manual HBM DMA slices must span
        full 128-lane tiles, so src is lane-padded to 128 here — pass a
        128-lane array (e.g. ops/segsum raw output) to skip the pad copy;
        only the first ``out_cols`` columns are returned.
      keys: (P,) int32; non-negative entries of block b must lie in
        [base[b], base[b] + block).
      base: (ceil(P / block),) int32 window starts (for nondecreasing clean
        keys: clean[b * block]); must be nondecreasing with increments
        <= block between consecutive blocks (true for clean-key bases).
      out_cols: columns of the result (default: src's column count).
      cols_layout: return (out_cols, P) column-major instead of
        (P, out_cols) — a (P, few) output pads its lanes to the 128 tile
        (14x memory/traffic at 9 columns) while columns are dense; the
        kernel just swaps the matmul operands.
      inner: blocks consumed per program from one superset window DMA.
    Returns (P, out_cols) float32, or (out_cols, P) when ``cols_layout``.
    """
    P = keys.shape[0]
    S, C = src.shape
    if out_cols is None:
        out_cols = C
    if C != 128:
        src = jnp.pad(src, ((0, 0), (0, 128 - C)))
    B = block
    nb = -(-P // B)
    nprog = -(-nb // inner)
    P_pad = nprog * inner * B
    if P_pad != P:
        keys = jnp.pad(keys, (0, P_pad - P), constant_values=-1)
    base = jnp.pad(base, (0, nprog * inner - base.shape[0]), mode="edge")
    keys2d = keys.reshape(nprog * inner, B)
    kernel = functools.partial(
        _expand_kernel, B, out_cols, inner, nprog, cols_layout
    )
    out_spec = (
        pl.BlockSpec(
            (out_cols, inner * B), lambda s: (0, s), memory_space=pltpu.VMEM
        )
        if cols_layout
        else pl.BlockSpec(
            (inner * B, out_cols), lambda s: (s, 0), memory_space=pltpu.VMEM
        )
    )
    out_sh = (out_cols, P_pad) if cols_layout else (P_pad, out_cols)
    out = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # base, full
            pl.BlockSpec(
                (inner, B), lambda s: (s, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # src stays in HBM
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_sh, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, inner * B, 128), jnp.float32),  # double-buffered
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(base, keys2d, src)
    return out[:, :P] if cols_layout else out[:P]


def _span_expand_kernel(B, W, C, inner, nprog, off_col, cum_col, base_ref,
                        src_ref, out_ref, stage, sem):
    s = pl.program_id(0)
    slot = jax.lax.rem(s, 2)
    GW = inner * B + 8  # owners advance <= 1 per output + W = B + 8 slack

    @pl.when(s == 0)
    def _():
        pltpu.make_async_copy(
            src_ref.at[pl.ds(base_ref[0], GW), :], stage.at[0], sem.at[0]
        ).start()

    @pl.when(s + 1 < nprog)
    def _():
        nxt = jax.lax.rem(s + 1, 2)
        pltpu.make_async_copy(
            src_ref.at[pl.ds(base_ref[(s + 1) * inner], GW), :],
            stage.at[nxt], sem.at[nxt],
        ).start()

    pltpu.make_async_copy(
        src_ref.at[pl.ds(base_ref[s * inner], GW), :], stage.at[slot],
        sem.at[slot],
    ).wait()
    win0 = base_ref[s * inner]
    for i in range(inner):
        bi = s * inner + i
        rel = base_ref[bi] - win0
        sub = stage[slot, pl.ds(rel, W), :]  # (W, 128)
        # owner membership straight from the exclusive/inclusive
        # count-cumsum columns riding the window (both pre-clamped f32-exact
        # by the caller): row w owns output j iff off_w <= j < cum_w.
        j = (
            jax.lax.broadcasted_iota(jnp.int32, (W, B), 1) + bi * B
        ).astype(jnp.float32)
        off_w = sub[:, off_col][:, None]
        cum_w = sub[:, cum_col][:, None]
        onehot = (off_w <= j) & (j < cum_w)  # (W, B)
        res = onehot_matmul(
            sub, onehot, (((0,), (0,)), ((), ()))
        )  # (128, B) column-major output block
        out_ref[:, i * B:(i + 1) * B] = res[:C, :]


def expand_spans(
    src: jnp.ndarray,
    base: jnp.ndarray,
    num_out: int,
    block: int = 256,
    out_cols: int | None = None,
    off_col: int = 3,
    cum_col: int = 6,
    inner: int = 8,
) -> jnp.ndarray:
    """Span expansion: ``out[:, j] = src[g(j), :]`` where ``g(j)`` is the
    unique row with ``src[g, off_col] <= j < src[g, cum_col]`` (the owner
    lookup of ops/binning pair expansion), zero column where no row matches.

    Fuses the owner lookup INTO the one-hot expansion: the membership test
    runs on the count-cumsum columns riding the DMA window, so no owner
    array, histogram scatter, or P-length cumsum is ever materialized
    (replaces ~9.5 ms of hist + int cumsum at bench scale with in-kernel
    compares).

    Args:
      src: (S, C) f32 rows; off/cum columns must be nondecreasing integers
        clamped below 2**24 (f32-exact compares), and S must cover every
        superset window read [base[s*inner], + block*inner + 8).
      base: (ceil(num_out / block),) int32 = owner of output b * block
        (searchsorted(cum, starts, 'right'); owners advance at most 1 per
        output, so the window [base, base + block + 8) covers each block).
      num_out: P, number of output columns.
      inner: blocks consumed per program from one superset window DMA.
    Returns (out_cols, P) f32, column-major.
    """
    S, C = src.shape
    if out_cols is None:
        out_cols = C
    if C != 128:
        src = jnp.pad(src, ((0, 0), (0, 128 - C)))
    B = block
    W = B + 8
    nb = -(-num_out // B)
    nprog = -(-nb // inner)
    P_pad = nprog * inner * B
    base = jnp.pad(base, (0, nprog * inner - base.shape[0]), mode="edge")
    kernel = functools.partial(
        _span_expand_kernel, B, W, out_cols, inner, nprog, off_col, cum_col
    )
    out = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # base, full
            pl.BlockSpec(memory_space=pl.ANY),  # src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (out_cols, inner * B), lambda s: (0, s), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((out_cols, P_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, inner * B + 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(base, src)
    return out[:, :num_out]
