"""Sorted-key segment sum as a Pallas TPU kernel.

The gradient-routing backward (ops/rasterize_pallas._composite_pairroute_bwd)
must reduce per-pair gradient rows to per-segment rows. Gaussian-major pairs
have *sorted* keys (the valid-compaction rank rides the pair expansion,
ops/binning), so the reduction over a block of B pairs is a one-hot matmul on
the MXU:

    sums_local[r, c] = sum_j [keys[j] - rf == r] * vals[j, c]     (rf = min key)

A block of B pairs spans at most B distinct ranks (keys are nondecreasing
with increments <= 1, so present ranks are consecutive), and each program's
``inner`` consecutive blocks span at most W = B * inner ranks. Block sums are
staged into a (W, 128) VMEM window at sublane offset ``rf - rf0``; in-VMEM
overwrites resolve block-boundary partials the same way the original
HBM-window design did (later, more complete rows overwrite earlier partials,
and a rank spanning blocks is carried: the carry holds the running partial of
the block's last rank and is folded into local row 0 of the next block when
that rank continues). One DMA per *program* then writes the whole window to
output rows [rf0, rf0 + W), pipelined one-in-flight: the previous program's
copy is awaited only before starting the next (consecutive windows overlap at
the boundary rank, so two copies must never be in flight together), letting
the copy ride under the next window's matmuls. This replaced a copy per
*block* (start+wait inline, 10k serial DMA latencies ~= 13 ms at bench scale).

Padding keys (value num_segments - 1) merge into the carry chain of the real
last rank when it is also num_segments - 1, and otherwise produce one-hot
columns with no match (local offset >= B) plus zero staged rows that only ever
land on rows past the live prefix; the window clip keeps their store offset in
bounds (a pad block's rank span inside a mixed program is < W - B by
construction: i leading real blocks cover at most i*B - 1 ranks).

Restriction: rows of the output in [n_live, N) for ranks with zero pairs in
the *suffix* are left unwritten (garbage) — callers mask with the live-rank
prefix count, or route through ops/expand with masked keys (its one-hot drops
negative keys, so garbage rows are never read).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simplegaussiansplat_tk71_tpu.ops.expand import onehot_matmul


def _segsum_kernel(B, C, inner, nprog, cols_layout, vals_ref, keys_ref,
                   out_ref, win_ref, carry_ref, last_rank_ref, sem):
    s0 = pl.program_id(0)
    W = B * inner
    slot = jax.lax.rem(s0, 2)

    @pl.when(s0 == 0)
    def _():
        carry_ref[:, :] = jnp.zeros((1, C), jnp.float32)
        last_rank_ref[0] = -1

    rows = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    rf0 = jnp.min(keys_ref[0, 0:B])
    for i in range(inner):
        # keys ride as a (1, B) LANE vector: the sort emits 1-D keys, and a
        # (P, 1) sublane layout forced a 1.6 ms HBM relayout copy per step
        # (r5 trace, copy.45). The one-hot is built transposed ([r, j]) so
        # no in-kernel transpose is needed either.
        keys = keys_ref[0, i * B:(i + 1) * B]  # (1-lane slice) int32, sorted
        rf = jnp.min(keys)
        rl = jnp.max(keys)
        r_sub = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        onehot = (r_sub == (keys - rf)[None, :]).astype(
            jnp.float32
        )  # (B, B): [r, j]
        # the TPU DEFAULT precision truncates f32 matmul inputs to one bf16
        # pass (rounds every gradient row to ~3 digits); the bf16x3 split of
        # the value operand against the bf16-exact one-hot keeps the sums
        # f32-faithful at half of HIGHEST's passes (ops/expand.onehot_matmul)
        if cols_layout:
            vals = vals_ref[:, i * B:(i + 1) * B]  # (C, B)
            sums = onehot_matmul(
                vals, onehot, (((1,), (1,)), ((), ())), transpose=True
            )  # (B, C) per local rank
        else:
            vals = vals_ref[i * B:(i + 1) * B, :]  # (B, C)
            sums = onehot_matmul(
                vals, onehot, (((1,), (0,)), ((), ())), transpose=True
            )  # (B, C) per local rank
        # fold the carried partial of the previous block's last rank into
        # local row 0 when that rank continues into this block
        cont = (last_rank_ref[0] == rf).astype(jnp.float32)
        sums = sums + jnp.where(rows == 0, cont * carry_ref[0, :][None, :], 0.0)
        # new carry: the (partially complete) sum of this block's last rank
        carry_ref[0, :] = jnp.sum(
            jnp.where(rows == (rl - rf), sums, 0.0), axis=0
        )
        last_rank_ref[0] = rl
        # stage at 128 lanes (Mosaic requires HBM DMA slices lane-aligned to
        # the (1, 128) tiling; sublane offsets stay arbitrary)
        off = jnp.clip(rf - rf0, 0, W - B)
        win_ref[pl.ds(slot * W + off, B), :] = jnp.pad(
            sums, ((0, 0), (0, 128 - C))
        )

    # one-in-flight pipelined flush: wait the previous program's copy (its
    # window may overlap this one at the boundary rank) only now, so it ran
    # under this program's matmuls
    @pl.when(s0 > 0)
    def _():
        pltpu.make_async_copy(
            win_ref.at[pl.ds((1 - slot) * W, W)], out_ref.at[pl.ds(0, W)], sem
        ).wait()

    copy = pltpu.make_async_copy(
        win_ref.at[pl.ds(slot * W, W)], out_ref.at[pl.ds(rf0, W)], sem
    )
    copy.start()

    @pl.when(s0 == nprog - 1)
    def _():
        copy.wait()


def segment_sum_sorted(
    vals: jnp.ndarray,
    keys: jnp.ndarray,
    num_segments: int,
    block: int | None = None,
    inner: int | None = None,
    raw: bool = False,
    cols_layout: bool = False,
) -> jnp.ndarray:
    """Segment sum of ``vals`` (P, C) by sorted int32 ``keys`` (P,) in
    [0, num_segments). Returns (num_segments, C), or the raw padded
    (num_segments + block * inner, 128) buffer when ``raw`` (rows past the
    live prefix are garbage — see module docstring).

    Keys must be nondecreasing with increments <= 1 (so the set of keys that
    occur is a prefix [0, n_live); tail segments get zeros or garbage).

    ``vals`` may be (P, C) rows or — preferred on TPU — (C, P) columns
    (``cols_layout=True``): a (P, few) HBM buffer pads its C lanes to the
    128 tile (14x traffic at C=9), while (C, P) is dense.
    """
    # the one-hot matmul cost scales with block (P * block * C_padded MACs
    # total); the carry chain + per-block overhead scale with 1/block.
    # Env-tunable for on-device A/B (SoL says this stage runs at ~1.3% of a
    # read+write bound, so the flop term is not obviously the binding cost).
    if block is None:
        block = int(os.environ.get("SGS_SEGSUM_BLOCK", "256"))
    if inner is None:
        inner = max(2048 // block, 1)
    if cols_layout:
        C, P = vals.shape
    else:
        P, C = vals.shape
    N = num_segments
    step = block * inner
    P_pad = -(-P // step) * step
    if P_pad != P:
        pad = ((0, 0), (0, P_pad - P)) if cols_layout else ((0, P_pad - P), (0, 0))
        vals = jnp.pad(vals, pad)
        keys = jnp.pad(keys, (0, P_pad - P), constant_values=N - 1)
    # keys enter the kernel as a (1, P) LANE row: a (P, 1) sublane layout
    # forces XLA to relayout the sort's 1-D key output in HBM (1.6 ms/step
    # at the 1M bench, r5 trace copy.45)
    keys = keys.reshape(1, P_pad)
    nprog = P_pad // step
    kernel = functools.partial(
        _segsum_kernel, block, C, inner, nprog, cols_layout
    )
    vals_spec = (
        pl.BlockSpec((C, step), lambda s: (0, s), memory_space=pltpu.VMEM)
        if cols_layout
        else pl.BlockSpec((step, C), lambda s: (s, 0), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=[
            vals_spec,
            pl.BlockSpec(
                (1, step), lambda s: (0, s), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N + step, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * step, 128), jnp.float32),  # double-buffered window
            pltpu.VMEM((1, C), jnp.float32),  # carry
            pltpu.SMEM((1,), jnp.int32),  # last rank
            pltpu.SemaphoreType.DMA,
        ],
    )(vals, keys)
    if raw:
        return out
    return out[:N, :C]


def segment_sum_sorted_masked(
    vals: jnp.ndarray,
    keys: jnp.ndarray,
    num_segments: int,
    n_live: jnp.ndarray,
    block: int = 256,
    inner: int = 8,
) -> jnp.ndarray:
    """segment_sum_sorted with the unwritten-tail rows zeroed: rows at
    index >= n_live (segments with no pairs) are forced to 0."""
    out = segment_sum_sorted(vals, keys, num_segments, block, inner)
    rows = jnp.arange(num_segments, dtype=jnp.int32)[:, None]
    return jnp.where(rows < n_live, out, 0.0)
