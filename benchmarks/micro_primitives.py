"""Definitive primitive timings: R chained reps inside ONE jit (data-dependent
carry serializes them), one host fetch at the end. ms = (t - overhead) / R.
The axon tunnel costs ~26 ms per host fetch and block_until_ready does not
reliably sync, so per-call timing harnesses lie (see micro_sort_check2)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 20


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    Pn = 2_500_000
    N = 1_000_000
    T = 2500
    K = 1024
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, T + 1, Pn).astype(np.int32))
    gid = jnp.asarray(rng.integers(0, N, Pn).astype(np.int32))
    depthbits = jnp.asarray(rng.integers(0, 1 << 30, Pn).astype(np.int32))
    j = jnp.arange(Pn, dtype=jnp.int32)
    perm25 = jnp.asarray(rng.permutation(Pn).astype(np.int32))
    perm1m = jnp.asarray(rng.permutation(N).astype(np.int32))
    jn = jnp.arange(N, dtype=jnp.int32)

    overhead = [0.0]

    def bench(name, body, args, sub=True):
        """body(carry:int32, *args) -> (new_carry:int32 scalar-array)."""

        @jax.jit
        def run(c0, *a):
            def f(_, c):
                return body(c, *a)

            return jax.lax.fori_loop(0, R, f, c0)

        float(run(jnp.int32(0), *args))
        t0 = time.time()
        v = float(run(jnp.int32(1), *args))
        dt = (time.time() - t0) * 1e3
        ms = (dt - overhead[0]) / R if sub else dt
        print(json.dumps({"case": name, "ms": round(ms, 2)}), flush=True)
        return v

    bench("noop_total_ms", lambda c, t: c + t[0], (tile,), sub=False)
    overhead[0] = 0.0
    t0 = time.time()
    # measure fixed overhead: run the noop again, its total IS the overhead

    @jax.jit
    def noop(c0, t):
        def f(_, c):
            return c + t[0]

        return jax.lax.fori_loop(0, R, f, c0)

    float(noop(jnp.int32(0), tile))
    t0 = time.time()
    float(noop(jnp.int32(1), tile))
    overhead[0] = (time.time() - t0) * 1e3
    print(json.dumps({"case": "fetch_overhead_ms", "ms": round(overhead[0], 2)}),
          flush=True)

    def s_1key3(c, t, g, jj):
        o = jax.lax.sort((t + (c % 2), g, jj), num_keys=1, is_stable=True)
        return o[1][12345] + o[2][54321]

    bench("sort_1key_3ops_stable", s_1key3, (tile, gid, j))

    def s_2key4(c, t, d, g, jj):
        o = jax.lax.sort((t + (c % 2), d, g, jj), num_keys=2)
        return o[2][12345] + o[3][54321]

    bench("sort_2key_4ops", s_2key4, (tile, depthbits, gid, j))

    def s_2key3(c, t, d, jj):
        o = jax.lax.sort((t + (c % 2), d, jj), num_keys=2)
        return o[2][12345]

    bench("sort_2key_3ops", s_2key3, (tile, depthbits, j))

    def s_inv25(c, p, jj):
        pp = (p + c) % Pn
        return jax.lax.sort((pp, jj), num_keys=1)[1][12345]

    bench("invperm_2.5m_sort", s_inv25, (perm25, j))

    def s_inv1m(c, p, jj):
        pp = (p + c) % N
        return jax.lax.sort((pp, jj), num_keys=1)[1][12345]

    bench("invperm_1m_sort", s_inv1m, (perm1m, jn))

    def s_argsort_gathers(c, d, m2, bb):
        order = jnp.argsort(d + c.astype(jnp.float32)).astype(jnp.int32)
        a = m2[order]
        b = bb[order]
        return (a[12345, 0] + b[54321, 1]).astype(jnp.int32)

    depth = jnp.asarray(rng.uniform(1, 10, N).astype(np.float32))
    m2 = jnp.asarray(rng.uniform(0, 800, (N, 2)).astype(np.float32))
    bb = jnp.asarray(rng.uniform(1, 30, (N, 2)).astype(np.float32))
    bench("depth_argsort_plus_2gathers", s_argsort_gathers, (depth, m2, bb))

    rows5 = jnp.asarray(rng.integers(0, 100, (N, 5)).astype(np.int32))
    rows4 = rows5[:, :4]
    gq = jnp.asarray(rng.integers(0, N, Pn).astype(np.int32))

    def g5(c, r, g):
        return r[(g + c) % N].sum().astype(jnp.int32) % 7 + c

    bench("gather_P_rows5", g5, (rows5, gq))

    def g4(c, r, g):
        return r[(g + c) % N].sum().astype(jnp.int32) % 7 + c

    bench("gather_P_rows4", g4, (rows4, gq))

    # seg_len searchsorted vs hist at T queries
    tile_s = jnp.sort(tile)
    tids = jnp.arange(T, dtype=jnp.int32)

    def ss(c, ts_):
        a = jnp.searchsorted(ts_, tids + (c % 2), side="left")
        b = jnp.searchsorted(ts_, tids + (c % 2), side="right")
        return (b - a)[123].astype(jnp.int32) + c

    bench("seglen_searchsorted", ss, (tile_s,))

    # hist+cumsum owner lookup (P bins)
    cnts = jnp.asarray(rng.integers(0, 5, N).astype(np.int32))

    def owner(c, counts):
        cum = jnp.cumsum(counts + (c % 2))
        hist = jnp.zeros((Pn,), jnp.int32).at[jnp.minimum(cum + c % 2, Pn - 1)].add(
            1, mode="drop"
        )
        g = jnp.minimum(jnp.cumsum(hist), N - 1)
        return g[12345] + c

    bench("owner_hist_cumsum", owner, (cnts,))

    # dense table gather: (T*K,) from sorted pair gids
    def tbl(c, gs):
        seg_start = jnp.sort(jnp.asarray(
            rng.integers(0, Pn - K, T).astype(np.int32)))
        idx = jnp.minimum(seg_start[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :] + c % 2, Pn - 1)
        return gs[idx].sum().astype(jnp.int32) % 7 + c

    bench("table_gather_TxK", tbl, (gid,))


if __name__ == "__main__":
    main()
