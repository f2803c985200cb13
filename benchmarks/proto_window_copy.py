"""Prototype: build the (T, 16, K) kernel attr table from tile-sorted
pair-space attrs with an aligned-window DMA + dynamic roll Pallas kernel,
vs the XLA row-gather chain. Correctness (np.allclose) + chained timing."""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A = 16


def _copy_kernel(K, mode, seg_start_ref, seg_len_ref, src_ref, out_ref,
                 scratch, sem):
    t = pl.program_id(0)
    start = seg_start_ref[t]
    if mode == "dma_unaligned":
        copy = pltpu.make_async_copy(
            src_ref.at[:, pl.ds(start, K + 128)], scratch, sem
        )
        copy.start()
        copy.wait()
        shifted = scratch[:, :K]
    else:
        a0 = (start // 128) * 128
        r = start - a0
        copy = pltpu.make_async_copy(
            src_ref.at[:, pl.ds(a0, K + 128)], scratch, sem
        )
        copy.start()
        copy.wait()
        win = scratch[:, :]  # (A, K+128)
        if mode == "roll":
            shifted = pltpu.roll(win, -r, axis=1)[:, :K]
        elif mode == "roll_pos":
            shifted = pltpu.roll(win, (K + 128) - r, axis=1)[:, :K]
        else:
            shifted = scratch[:, pl.ds(r, K)]
    length = jnp.minimum(seg_len_ref[t], K)
    lane = jax.lax.broadcasted_iota(jnp.int32, (A, K), 1)
    out_ref[0] = jnp.where(lane < length, shifted, 0.0)


def window_table(attrs_pair, seg_start, seg_len, K, T, mode="roll"):
    Pa = attrs_pair.shape[1]
    kernel = functools.partial(_copy_kernel, K, mode)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, A, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, A, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((A, K + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(seg_start, seg_len, attrs_pair)


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    T, K = 2500, 1024
    Pn = 2_500_000
    rng = np.random.default_rng(0)
    # random segment layout over pair space
    seg_len = rng.integers(0, 1600, T).astype(np.int32)
    seg_start = (np.cumsum(seg_len) - seg_len).astype(np.int32)
    total = int(seg_len.sum())
    Pa = -(-max(total + K + 256, Pn) // 128) * 128
    attrs = rng.uniform(-1, 1, (A, Pa)).astype(np.float32)

    a_d = jnp.asarray(attrs)
    ss_d = jnp.asarray(seg_start)
    sl_d = jnp.asarray(seg_len)

    # XLA reference
    @jax.jit
    def xla_table(a, ss, sl):
        k = jnp.arange(K, dtype=jnp.int32)
        idx = jnp.minimum(ss[:, None] + k[None, :], Pa - 1)
        tab = a[:, idx]  # (A, T, K)
        tab = jnp.swapaxes(tab, 0, 1)
        mask = k[None, :] < jnp.minimum(sl, K)[:, None]
        return jnp.where(mask[:, None, :], tab, 0.0)

    ref = np.asarray(xla_table(a_d, ss_d, sl_d))

    for mode in ("roll", "roll_pos", "dma_unaligned"):
        try:
            out = np.asarray(window_table(a_d, ss_d, sl_d, K, T, mode))
            ok = np.allclose(out, ref)
            print(json.dumps({"mode": mode, "correct": bool(ok),
                              "maxerr": float(np.abs(out - ref).max())}),
                  flush=True)
        except Exception as e:  # noqa
            print(json.dumps({"mode": mode, "error": str(e)[:500]}), flush=True)

    # chained timing, one fetch
    R = 20

    def chain(fn):
        @jax.jit
        def run(c0, a, ss, sl):
            def f(_, c):
                o = fn(a, ss + (c % 2), sl)
                return c + o[123, 0, 17].astype(jnp.int32) % 3

            return jax.lax.fori_loop(0, R, f, c0)

        return run

    @jax.jit
    def noop(c0, a):
        def f(_, c):
            return c + a[0, 0].astype(jnp.int32) % 2

        return jax.lax.fori_loop(0, R, f, c0)

    float(noop(jnp.int32(0), a_d))
    t0 = time.time()
    float(noop(jnp.int32(1), a_d))
    oh = (time.time() - t0) * 1e3
    print(json.dumps({"case": "overhead_ms", "ms": round(oh, 2)}), flush=True)

    for name, fn in (
        ("pallas_roll", lambda a, ss, sl: window_table(a, ss, sl, K, T, "roll")),
        ("xla_gather", xla_table),
    ):
        run = chain(fn)
        float(run(jnp.int32(0), a_d, ss_d, sl_d))
        t0 = time.time()
        float(run(jnp.int32(1), a_d, ss_d, sl_d))
        dt = ((time.time() - t0) * 1e3 - oh) / R
        print(json.dumps({"case": name, "ms": round(dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
