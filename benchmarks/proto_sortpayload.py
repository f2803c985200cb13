"""TPU timing: can the pair sort carry the 9 render-attr columns?

Compares (2-key sort + tile-order row gather of attrs) vs (2-key sort with
9 f32 payload columns). Also times expand_rows on a 15-column source (the
one-expansion-for-everything binning plan) and a big-block variant.
Chained-rep harness (NOTES.md).
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
    Pn = 2_500_000
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, 2500, Pn).astype(np.int32))
    depth = jnp.asarray(rng.integers(0, 1 << 30, Pn).astype(np.int32))
    g = np.sort(rng.integers(0, N, Pn).astype(np.int32))
    gj = jnp.asarray(g)
    j = jnp.arange(Pn, dtype=jnp.int32)
    attrs = jnp.asarray(rng.normal(size=(Pn, 9)).astype(np.float32))
    packed = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))

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

    float(noop(jnp.int32(0), attrs))
    t0 = time.time()
    float(noop(jnp.int32(1), attrs))
    overhead[0] = (time.time() - t0) * 1e3
    log(f"fetch overhead: {overhead[0]:.1f} ms")

    def tap(x):
        return x.reshape(-1)[::8191].sum().astype(jnp.int32) % 5

    # baseline: 2-key sort, 2 int payloads
    def s0(c, t, d, g_, j_):
        o = jax.lax.sort((t + c % 2, d, g_, j_), num_keys=2)
        return (o[2][12345] % 7) + c

    bench("sort_2key_2pay", s0, (tile, depth, gj, j))

    # 2-key sort carrying 9 f32 attr columns (+ the 2 int payloads)
    def s1(c, t, d, g_, j_, a):
        cols = tuple(a[:, i] for i in range(9))
        o = jax.lax.sort((t + c % 2, d, g_, j_) + cols, num_keys=2)
        return (o[2][12345] % 7) + tap(o[4]) + c

    bench("sort_2key_11pay", s1, (tile, depth, gj, j, attrs))

    # tile-order random row gather of the 9 attrs (what the sort replaces)
    def ga(c, pk, idx):
        return tap(pk[jnp.minimum(idx + c % 2, N - 1)]) + c

    perm = jnp.asarray(rng.permutation(np.repeat(g[: Pn // 2], 2))[:Pn])
    bench("tileorder_gather_16c", ga, (packed, perm))

    # expand with a 15-col source at pair scale (sorted g keys, steps forced
    # <= 1 by construction here)
    gcl = np.minimum(np.cumsum(rng.random(Pn) < 0.4), N - 1).astype(np.int32)
    gcl = gcl - gcl[0]
    for B in (128, 256):
        nb = -(-Pn // B)
        base = jnp.asarray(
            np.pad(gcl, (0, nb * B - Pn), mode="edge")[::B].astype(np.int32)
        )
        kj = jnp.asarray(gcl)
        bench(
            f"expand_pairs_B{B}",
            lambda c, s, k, b, B_=B: tap(
                expand_rows(s + (c % 2).astype(jnp.float32), k, b, B_)
            )
            + c,
            (packed, kj, base),
        )


if __name__ == "__main__":
    main()
