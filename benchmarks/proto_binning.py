"""Binning sub-stage attribution at bench scale (post sort-carried attrs)."""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
R = 10

def main():
    import jax, jax.numpy as jnp
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    N, Pn, T = 1_000_000, 2_200_000, 2500
    rng = np.random.default_rng(0)
    overhead = [0.0]

    def bench(name, body, args):
        @jax.jit
        def run(c0, *a):
            return jax.lax.fori_loop(0, R, lambda _, c: body(c, *a), c0)
        float(run(jnp.int32(0), *args))
        t0 = time.time()
        float(run(jnp.int32(1), *args))
        ms = ((time.time() - t0) * 1e3 - overhead[0]) / R
        print(json.dumps({"stage": name, "ms": round(ms, 2)}), flush=True)

    probe = jnp.zeros((8, 128), jnp.float32)
    @jax.jit
    def noop(c0, x):
        return jax.lax.fori_loop(0, R, lambda _, c: c + x[0, 0].astype(jnp.int32) % 2, c0)
    float(noop(jnp.int32(0), probe)); t0 = time.time(); float(noop(jnp.int32(1), probe))
    overhead[0] = (time.time() - t0) * 1e3

    def tap(x):
        return x.reshape(-1)[::8191].sum().astype(jnp.int32) % 5

    g = jnp.asarray(np.sort(rng.integers(0, N, Pn)).astype(np.int32))
    tile = jnp.asarray(rng.integers(0, T, Pn).astype(np.int32))
    depth = jnp.asarray(rng.integers(0, 1 << 30, Pn).astype(np.int32))
    cols6 = [jnp.asarray(rng.integers(0, 1 << 20, N).astype(np.int32)) for _ in range(6)]
    cols15 = cols6 + [jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32)) for _ in range(9)]

    for nc, cols in ((6, cols6), (15, cols15)):
        packed = jnp.stack(cols, 1)
        def gb(c, pk, g_):
            rows = pk[jnp.minimum(g_ + c % 2, N - 1)]
            return tap(rows) + c
        bench(f"rows_gather_{nc}", gb, (packed, g))

    rows15 = jnp.stack(cols15, 1)[g]
    # sort with payload columns taken as slices of the padded rows matrix
    def s_rows(c, t, d, rw):
        ops = (t + c % 2, d) + tuple(rw[:, i] for i in range(2, 15))
        o = jax.lax.sort(ops, num_keys=2)
        return (o[3][123] % 7) + c
    bench("sort13_from_rows", s_rows, (tile, depth, rows15))

    # sort with payload columns pre-materialized 1-D
    pcols = [jnp.asarray(np.asarray(rows15[:, i])) for i in range(2, 15)]
    def s_cols(c, t, d, *pc):
        o = jax.lax.sort((t + c % 2, d) + pc, num_keys=2)
        return (o[3][123] % 7) + c
    bench("sort13_from_1d", s_cols, (tile, depth) + tuple(pcols))

    def s_4(c, t, d, p1, p2):
        o = jax.lax.sort((t + c % 2, d, p1, p2), num_keys=2)
        return (o[3][123] % 7) + c
    bench("sort4", s_4, (tile, depth, pcols[0], pcols[1]))

if __name__ == "__main__":
    main()
