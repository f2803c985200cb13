"""TPU timing: expand_rows kernel vs the XLA seg_of_gauss gather.

Chained-rep harness (NOTES.md: block_until_ready unreliable over axon).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.ops.expand import expand_rows

    log("devices:", jax.devices())
    N = 1_000_000
    BLK = 512
    rng = np.random.default_rng(0)
    valid = rng.random(N) < 0.97
    vid = np.maximum(np.cumsum(valid.astype(np.int32)) - 1, 0)
    n_live = int(valid.sum())
    keys = np.where(valid, vid, -1).astype(np.int32)
    nb = -(-N // BLK)
    base = np.pad(vid, (0, nb * BLK - N), mode="edge")[::BLK].astype(np.int32)
    seg_of_gauss = np.where(valid, vid, N - 1).astype(np.int32)

    sums128 = jnp.asarray(rng.normal(size=(N + 512, 128)).astype(np.float32))
    sums16 = jnp.asarray(np.asarray(sums128[:, :16]))
    sums9 = jnp.asarray(np.asarray(sums128[:, :9]))
    keys_j = jnp.asarray(keys)
    base_j = jnp.asarray(base)
    sog = jnp.asarray(seg_of_gauss)

    overhead = [0.0]

    def bench(name, body, args):
        @jax.jit
        def run(c0, *a):
            def fb(_, c):
                return body(c, *a)

            return jax.lax.fori_loop(0, R, fb, c0)

        float(run(jnp.int32(0), *args))
        t0 = time.time()
        float(run(jnp.int32(1), *args))
        ms = ((time.time() - t0) * 1e3 - overhead[0]) / R
        print(json.dumps({"stage": name, "ms": round(ms, 2)}), flush=True)

    @jax.jit
    def noop(c0, x):
        def fb(_, c):
            return c + x[0, 0].astype(jnp.int32) % 2

        return jax.lax.fori_loop(0, R, fb, c0)

    float(noop(jnp.int32(0), sums16))
    t0 = time.time()
    float(noop(jnp.int32(1), sums16))
    overhead[0] = (time.time() - t0) * 1e3
    log(f"fetch overhead: {overhead[0]:.1f} ms")

    def tap(x):
        return x.reshape(-1)[::8191].sum().astype(jnp.int32) % 5

    # correctness on-device first (C=16)
    got = np.asarray(expand_rows(sums16, keys_j, base_j, BLK))
    want = np.where(valid[:, None], np.asarray(sums16)[seg_of_gauss], 0.0)
    err = np.abs(got - want).max()
    log("expand C=16 max err:", err)
    assert err == 0.0, err

    bench(
        "xla_gather_9",
        lambda c, s, i: tap(s[jnp.minimum(i + c % 2, N - 1)]) + c,
        (sums9, sog),
    )
    bench(
        "xla_gather_16",
        lambda c, s, i: tap(s[jnp.minimum(i + c % 2, N - 1)]) + c,
        (sums16, sog),
    )
    for C, src in ((16, sums16), (128, sums128)):
        bench(
            f"expand_C{C}",
            lambda c, s, k, b: tap(
                expand_rows(s + (c % 2).astype(jnp.float32), k, b, BLK)
            )
            + c,
            (src, keys_j, base_j),
        )
    # segsum (grouped-window kernel) at bench scale
    from simplegaussiansplat_tk71_tpu.ops.segsum import segment_sum_sorted

    Pn = 2_500_000
    pair_vals = jnp.asarray(rng.normal(size=(Pn, 9)).astype(np.float32))
    pk = np.cumsum(rng.random(Pn) < 0.4).astype(np.int32)
    pk = np.minimum(pk - pk[0], n_live - 1)  # keys must start at rank 0
    pair_keys = jnp.asarray(pk)
    got_s = np.asarray(
        segment_sum_sorted(pair_vals, pair_keys, N)[: pk.max() + 1]
    )
    want_s = np.zeros((pk.max() + 1, 9), np.float64)
    np.add.at(want_s, pk, np.asarray(pair_vals).astype(np.float64))
    err = np.abs(got_s - want_s)
    # the clamped tail rank sums ~1.5M values: f32 accumulation-order noise
    # alone is ~1e-3 there; every other segment must be f32-exact vs f64
    serr, terr = err[:-1].max(), err[-1].max()
    log("segsum max err (excl clamped tail):", serr, "tail:", terr)
    assert serr < 1e-5, serr
    assert terr < 0.1, terr
    for blk, inner in ((256, 8), (256, 16), (512, 8), (128, 16), (512, 16)):
        bench(
            f"segsum_b{blk}_i{inner}",
            lambda c, v, k, blk_=blk, inner_=inner: tap(
                segment_sum_sorted(
                    v + (c % 2).astype(jnp.float32), k, N, blk_, inner_
                )
            )
            + c,
            (pair_vals, pair_keys),
        )

    for B in (256, 1024):
        nb2 = -(-N // B)
        base2 = jnp.asarray(
            np.pad(vid, (0, nb2 * B - N), mode="edge")[::B].astype(np.int32)
        )
        bench(
            f"expand_C16_B{B}",
            lambda c, s, k, b, B_=B: tap(
                expand_rows(s + (c % 2).astype(jnp.float32), k, b, B_)
            )
            + c,
            (sums16, keys_j, base2),
        )


if __name__ == "__main__":
    main()
