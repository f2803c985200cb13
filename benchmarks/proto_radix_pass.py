"""Device experiment for the radix-partition sort question (VERDICT r4 #3).

The round-4 cost model (NOTES.md "sort frontier, round-4 re-analysis") put a
single 6-bit partition pass at ~2.2 ms for P=2.2M rows x 13 columns: the only
vectorized row placement on TPU is an in-block one-hot permutation MATMUL,
plus per-digit staging buffers in VMEM flushed to HBM in 128-lane chunks.
This script measures the two halves of that model ON DEVICE instead of
arguing about it for a third round:

  kernel A (permute):  per 256-row block — digit extract, in-block stable
      rank by digit (strict-lower-tri one-hot matmul), destination one-hot,
      payload permutation via bf16x3 matmuls (f32-exact), block written back
      to its own (static) slot. Measures the compute + HBM floor of a pass
      WITHOUT global placement.
  kernel B (flush):    the global-placement cost proxy — per block, 64
      conditional VMEM->HBM window DMAs (one per digit) gated by a
      prefetched schedule with the real expected flush rate (~2 flushes per
      block for uniform digits: a digit's 128-lane staging chunk fills every
      ~32 blocks). Measures DMA issue/serialization, the unmodeled unknown.

Decision rule (written into docs/SOL.md by the runner):
  A + B <~ 2.2 ms  -> the model holds; a 4-pass binning radix would land at
                      ~9-14 ms vs the measured 19.3 ms lax.sort: worth a
                      dedicated round of kernel work.
  A + B >> 2.2 ms  -> refuted; close the radix item.

  python benchmarks/proto_radix_pass.py            # TPU
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python benchmarks/proto_radix_pass.py --interpret --rows 131072
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 256  # rows per block
NDIG = 64  # 6-bit digit
NC = 16  # payload rows carried per block (13 used: 11 attrs + 2 keys)


def _permute_kernel(x_ref, out_ref):
    """One placement pass over one block: rank by digit + one-hot permute."""
    import jax
    import jax.numpy as jnp

    blk = x_ref[0]  # (NC, B) f32; row 0 carries the digit as a float VALUE
    digit = blk[0, :].astype(jnp.int32)  # (B,)
    # one-hot (B, NDIG)
    d_col = jax.lax.broadcasted_iota(jnp.int32, (B, NDIG), 1)
    onehot = (digit[:, None] == d_col).astype(jnp.float32)
    # stable in-block rank within digit: (#earlier rows of same digit)
    r = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    tril = (c < r).astype(jnp.bfloat16)
    prev = jax.lax.dot_general(
        tril, onehot.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, NDIG): prev[i, d] = # rows j < i with digit d  (exact: 0/1 sums)
    rank_within = jnp.sum(prev * onehot, axis=1)  # (B,)
    counts = jnp.sum(onehot, axis=0, keepdims=True)  # (1, NDIG)
    # exclusive digit starts via a strict-lower-tri matmul (Mosaic has no
    # cumsum primitive); counts are small ints — exact in one bf16 pass
    dr = jax.lax.broadcasted_iota(jnp.int32, (NDIG, NDIG), 0)
    dc = jax.lax.broadcasted_iota(jnp.int32, (NDIG, NDIG), 1)
    tril_d = (dr < dc).astype(jnp.bfloat16)
    starts = jax.lax.dot_general(
        counts.astype(jnp.bfloat16), tril_d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, NDIG) exclusive
    dest = (
        jnp.sum(starts * onehot, axis=1) + rank_within
    ).astype(jnp.int32)  # (B,)
    # permutation one-hot M with M[i, dest[i]] = 1: out = payload @ M
    m = (dest[:, None] == c[:B, :]).astype(jnp.float32)
    # bf16x3: payload split into three bf16 terms, M exact in bf16
    p0 = blk.astype(jnp.bfloat16)
    r0 = blk - p0.astype(jnp.float32)
    p1 = r0.astype(jnp.bfloat16)
    p2 = (r0 - p1.astype(jnp.float32)).astype(jnp.bfloat16)
    mb = m.astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(p0, mb, dims, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(p1, mb, dims, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(p2, mb, dims, preferred_element_type=jnp.float32)
    out_ref[0] = acc


def _flush_kernel(nprog, sched_ref, x_ref, out_ref, stage, sem):
    """DMA-issue proxy: per block, NDIG conditional window flushes.

    sched packs, per (block, digit), the flush decision and a precomputed
    HBM lane offset (or -1). The staging buffer content is fake (one block's
    payload reused) — kernel B measures ISSUE + completion cost of the
    expected number of (NC, 128)-window copies, not data correctness."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = pl.program_id(0)
    srow = jax.lax.rem(s, 8)
    stage[...] = x_ref[0, :, :128]
    for d in range(NDIG):
        off = sched_ref[srow, d]

        @pl.when(off >= 0)
        def _():
            cp = pltpu.make_async_copy(
                stage,
                out_ref.at[:, pl.ds(pl.multiple_of(off, 128), 128)],
                sem,
            )
            cp.start()
            cp.wait()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_200_000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    P = -(-args.rows // B) * B
    nb = P // B
    nb8 = -(-nb // 8) * 8
    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, (nb, NC, B)).astype(np.float32)
    digits = rng.integers(0, NDIG, (nb, B))
    x[:, 0, :] = digits.astype(np.float32)  # digit rides row 0 as a VALUE
    xd = jnp.asarray(x)

    perm = pl.pallas_call(
        _permute_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, NC, B), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, NC, B), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, NC, B), jnp.float32),
        interpret=args.interpret,
    )
    perm = jax.jit(perm)

    # correctness: block 0 must be stably sorted by digit with exact payloads
    out0 = np.asarray(perm(xd))[0]
    order = np.argsort(digits[0], kind="stable")
    np.testing.assert_array_equal(out0[0], digits[0][order].astype(np.float32))
    np.testing.assert_allclose(out0[1:], x[0, 1:][:, order], rtol=0, atol=0)
    print("permute kernel exact on block 0 (stable, f32-exact payloads)",
          file=sys.stderr)

    t0 = time.time()
    o = perm(xd)
    jax.block_until_ready(o)
    compile_a = time.time() - t0
    t0 = time.time()
    for _ in range(args.iters):
        o = perm(o)
    float(jnp.sum(o[0, 0, :1]))
    ms_a = (time.time() - t0) / args.iters * 1e3

    # kernel B: expected flush rate ~ NDIG * (B/NDIG) / 128 = B/128 = 2/block
    sched = np.full((nb8, NDIG), -1, np.int32)
    flush_mask = rng.uniform(size=(nb8, NDIG)) < (B / NDIG) / 128.0
    n_flush = int(flush_mask.sum())
    out_lanes = P + 128
    sched[flush_mask] = (
        rng.integers(0, (out_lanes - 128) // 128, n_flush) * 128
    )
    flush = pl.pallas_call(
        functools.partial(_flush_kernel, nb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((8, NDIG), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NC, B), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NC, out_lanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NC, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=args.interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    flush = jax.jit(flush)
    sched_d = jnp.asarray(sched)
    t0 = time.time()
    f = flush(sched_d, xd)
    jax.block_until_ready(f)
    compile_b = time.time() - t0
    t0 = time.time()
    for _ in range(args.iters):
        f = flush(sched_d, xd)
    jax.block_until_ready(f)
    ms_b = (time.time() - t0) / args.iters * 1e3

    result = {
        "rows": P,
        "blocks": nb,
        "payload_rows": NC,
        "digits": NDIG,
        "permute_ms": round(ms_a, 3),
        "flush_ms": round(ms_b, 3),
        "flushes": n_flush,
        "flush_us_each": round(ms_b * 1e3 / max(n_flush, 1), 3),
        "pass_ms_estimate": round(ms_a + ms_b, 3),
        "model_pass_ms": 2.2,
        "compile_s": [round(compile_a, 1), round(compile_b, 1)],
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
