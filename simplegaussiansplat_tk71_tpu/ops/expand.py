"""Sorted-key row expansion as a Pallas TPU kernel.

``expand_rows(src, keys, base)`` computes ``out[j] = src[keys[j]]`` (zero row
where ``keys[j] < 0``) for *locality-bounded* keys: within every block of B
consecutive outputs, all non-negative keys lie in ``[base[b], base[b] + B)``.
Nondecreasing keys with increments <= 1 (segment ranks from a valid-compaction
cumsum, ops/binning) satisfy this with ``base[b] = clean_keys[b * B]``.

Why: an XLA row gather is issue-rate bound on TPU (~37 ms for 1M x 36 B rows
at bench scale, independent of locality). With the window bound, each output
block needs only one contiguous (B, C) source window — a row-offset DMA (row
offsets need no 128-lane alignment) — and the in-window routing is a one-hot
matmul on the MXU, the transpose of the ops/segsum reduction:

    out[j, c] = sum_w [keys[j] - base == w] * window[w, c]

Each output element is a single 1.0 * x product, so bf16x3 (HIGHEST) keeps it
f32-exact (same argument as ops/segsum). Source windows are double-buffered:
block b+1's window DMA is issued before block b's compute (reads have no
ordering hazard, unlike segsum's overlapping output windows).

Used by the gradient-routing backward (ops/rasterize_pallas) to spread
per-segment gradient sums back to per-gaussian rows, replacing the reference's
scatter_reduce-to-Gaussians (gs_model.py:776-783) and our earlier 37 ms
``sums[seg_of_gauss]`` XLA gather with ~4 ms of DMA + MXU work.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _expand_kernel(B, C, nb, cols_out, base_ref, keys_ref, src_ref, out_ref,
                   stage, sem):
    b = pl.program_id(0)
    slot = jax.lax.rem(b, 2)
    # keys arrive as an (8, B) group of block rows (Mosaic requires sublane
    # blocks of 8); this program's row is b % 8
    keys = keys_ref[jax.lax.rem(b, 8), :]

    @pl.when(b == 0)
    def _():
        pltpu.make_async_copy(
            src_ref.at[pl.ds(base_ref[0], B), :], stage.at[0], sem.at[0]
        ).start()

    # prefetch the next block's window while this block computes
    @pl.when(b + 1 < nb)
    def _():
        nxt = jax.lax.rem(b + 1, 2)
        pltpu.make_async_copy(
            src_ref.at[pl.ds(base_ref[b + 1], B), :], stage.at[nxt],
            sem.at[nxt],
        ).start()

    pltpu.make_async_copy(
        src_ref.at[pl.ds(base_ref[b], B), :], stage.at[slot], sem.at[slot]
    ).wait()
    local = (keys - base_ref[b])[None, :]  # (1, B); masked -> < 0
    w = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    onehot = (w == local).astype(jnp.float32)  # [src row w, out row j]
    # windows may overrun the source's live prefix into uninitialized rows
    # (e.g. ops/segsum raw output); 0 * NaN = NaN would poison the matmul, so
    # zero non-finite lanes (rows the one-hot selects pass through untouched)
    win = stage[slot]
    win = jnp.where(jnp.isfinite(win), win, 0.0)
    if cols_out:
        # same contraction with operands swapped -> transposed result, so
        # the column-major output needs no in-kernel relayout
        res = jax.lax.dot_general(
            win, onehot,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (128, B)
        out_ref[:, :] = res[:C, :]
    else:
        res = jax.lax.dot_general(
            onehot, win,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, 128)
        out_ref[:, :] = res[:, :C]


def _span_expand_kernel(B, W, C, nb, off_col, cum_col, base_ref, src_ref,
                        out_ref, stage, sem):
    b = pl.program_id(0)
    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():
        pltpu.make_async_copy(
            src_ref.at[pl.ds(base_ref[0], W), :], stage.at[0], sem.at[0]
        ).start()

    @pl.when(b + 1 < nb)
    def _():
        nxt = jax.lax.rem(b + 1, 2)
        pltpu.make_async_copy(
            src_ref.at[pl.ds(base_ref[b + 1], W), :], stage.at[nxt],
            sem.at[nxt],
        ).start()

    pltpu.make_async_copy(
        src_ref.at[pl.ds(base_ref[b], W), :], stage.at[slot], sem.at[slot]
    ).wait()
    win = stage[slot]  # (W, 128)
    # owner membership straight from the exclusive/inclusive count-cumsum
    # columns riding the window (both pre-clamped f32-exact by the caller):
    # row w owns output j iff off_w <= j < cum_w. No keys array exists.
    j = (
        jax.lax.broadcasted_iota(jnp.int32, (W, B), 1) + b * B
    ).astype(jnp.float32)
    off_w = win[:, off_col][:, None]
    cum_w = win[:, cum_col][:, None]
    onehot = ((off_w <= j) & (j < cum_w)).astype(jnp.float32)  # (W, B)
    res = jax.lax.dot_general(
        win, onehot,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (128, B) column-major output block
    out_ref[:, :] = res[:C, :]


def expand_spans(
    src: jnp.ndarray,
    base: jnp.ndarray,
    num_out: int,
    block: int = 256,
    out_cols: int | None = None,
    off_col: int = 3,
    cum_col: int = 6,
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
        window read [base[b], base[b] + block + 8).
      base: (ceil(num_out / block),) int32 = owner of output b * block
        (searchsorted(cum, starts, 'right'); owners advance at most 1 per
        output, so the window [base, base + block + 8) covers the block).
      num_out: P, number of output columns.
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
    P_pad = nb * B
    kernel = functools.partial(
        _span_expand_kernel, B, W, out_cols, nb, off_col, cum_col
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # base, full (nb,)
            pl.BlockSpec(memory_space=pl.ANY),  # src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (out_cols, B), lambda b: (0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((out_cols, P_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, W, 128), jnp.float32),  # double-buffered windows
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(base, src)
    return out[:, :num_out]


def expand_rows(
    src: jnp.ndarray,
    keys: jnp.ndarray,
    base: jnp.ndarray,
    block: int = 512,
    out_cols: int | None = None,
    cols_layout: bool = False,
) -> jnp.ndarray:
    """Row expansion ``src[keys]`` with zero rows where ``keys < 0``.

    Args:
      src: (S, C) float32 source rows; S must be >= max(base) + block (pad the
        source — the window read [base[b], base[b] + block) must be in
        bounds; padding rows are never routed to the output). Manual HBM DMA
        slices must span full 128-lane tiles, so src is lane-padded to 128
        here — pass a 128-lane array (e.g. ops/segsum raw output) to skip
        the pad copy; only the first ``out_cols`` columns are returned.
      keys: (P,) int32; non-negative entries of block b must lie in
        [base[b], base[b] + block).
      base: (ceil(P / block),) int32 window starts (for nondecreasing clean
        keys: clean[b * block]).
      out_cols: columns of the result (default: src's column count).
      cols_layout: return (out_cols, P) column-major instead of
        (P, out_cols) — a (P, few) output pads its lanes to the 128 tile
        (14x memory/traffic at 9 columns) while columns are dense; the
        kernel just swaps the matmul operands.
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
    P_pad = nb * B
    if P_pad != P:
        keys = jnp.pad(keys, (0, P_pad - P), constant_values=-1)
    nb8 = -(-nb // 8) * 8
    keys2d = jnp.pad(
        keys.reshape(nb, B), ((0, nb8 - nb), (0, 0)), constant_values=-1
    )
    kernel = functools.partial(_expand_kernel, B, out_cols, nb, cols_layout)
    out_spec = (
        pl.BlockSpec((out_cols, B), lambda b: (0, b), memory_space=pltpu.VMEM)
        if cols_layout
        else pl.BlockSpec((B, out_cols), lambda b: (b, 0), memory_space=pltpu.VMEM)
    )
    out_sh = (out_cols, P_pad) if cols_layout else (P_pad, out_cols)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # base, full (nb,)
            pl.BlockSpec((8, B), lambda b: (b // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # src stays in HBM
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_sh, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, B, 128), jnp.float32),  # double-buffered windows
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(base, keys2d, src)
    return out[:, :P] if cols_layout else out[:P]
