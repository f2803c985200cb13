"""Sub-stage timing of the routed rasterizer at bench scale (v5e).

Chained-rep harness (see NOTES.md: block_until_ready unreliable, host fetch
~26 ms). Isolates: pair row gather, transpose, window-table kernel, composite
fwd kernel, composite bwd kernel, slot->pair gather, segsum, final gather.
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

    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.ops import binning, projection
    from simplegaussiansplat_tk71_tpu.ops import rasterize_pallas as rp
    from simplegaussiansplat_tk71_tpu.ops.expand import expand_rows
    from simplegaussiansplat_tk71_tpu.ops.segsum import segment_sum_sorted

    log("devices:", jax.devices())
    W = H = 800
    N = 1_000_000
    f = 600.0
    Kmax = int(os.environ.get("SGS_BENCH_K", "1024"))
    max_pairs = int(os.environ.get("SGS_BENCH_MAX_PAIRS", "2500000"))
    ts = 16
    ntx, nty = -(-W // ts), -(-H // ts)
    T = ntx * nty
    rng = np.random.default_rng(0)
    z = rng.uniform(4.0, 12.0, N).astype(np.float32)
    u = rng.uniform(-0.5, 0.5, N).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, N).astype(np.float32)
    xyz = np.stack([u * z * W / f, v * z * H / f, z], axis=1).astype(np.float32)
    model = init_from_points(
        xyz, rng.uniform(0.004, 0.02, N).astype(np.float32), capacity=None
    )
    params = model.trainable()
    Pm = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    Km = jnp.asarray(
        np.array([[[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]], np.float32)
    )
    proj = jax.jit(
        lambda p: projection.project(
            p["mean"], p["quat"], p["log_scale"], p["logit_opacity"], p["sh"],
            Pm, Km, (W, H), sh_degree=2, bbox_max_frac=0.4, alive=model.alive,
        )
    )(params)
    packed = jnp.concatenate(
        [proj.mean2d[0], proj.conic[0], proj.opacity[0][None],
         proj.color[0]], axis=0,
    )  # (9, N) component-major
    bins = jax.jit(
        lambda m2, bb, dp, vl, pk: binning.bin_gaussians(
            m2, bb, dp, vl, (W, H), tile_size=ts, max_pairs=max_pairs,
            max_per_tile=Kmax, build_table=False, attrs=pk,
        )
    )(proj.mean2d[0], proj.bbox_half[0], proj.depth[0], proj.valid[0], packed)
    Pn = bins.key_s.shape[0]
    N = bins.key_of_gauss.shape[0]  # capacity may round up
    K = Kmax
    only_route = bool(os.environ.get("SGS_ONLY_ROUTE"))

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

    float(noop(jnp.int32(0), packed))
    t0 = time.time()
    float(noop(jnp.int32(1), packed))
    overhead[0] = (time.time() - t0) * 1e3
    log(f"fetch overhead: {overhead[0]:.1f} ms")

    def tap(x):
        # data-dependent checksum over strided elements (defeats DCE without
        # reducing the whole array)
        return x.reshape(-1)[::8191].sum().astype(jnp.int32) % 5

    # 1. pair table from sort-carried attr columns (+ key row encode)
    def wt(c, a_s, ks, ss, sl):
        out = rp._pair_table(
            a_s + (c % 2).astype(jnp.float32), ks, ss, sl, K
        )
        return tap(out) + c

    if not only_route:
        bench(
            "pair_table",
            wt,
            (bins.attrs_s, bins.key_s, bins.seg_start, bins.seg_len),
        )
    attrs = jax.jit(
        lambda a_s, ks, ss, sl: rp._pair_table(a_s, ks, ss, sl, K)
    )(bins.attrs_s, bins.key_s, bins.seg_start, bins.seg_len)
    seg_len_c = jnp.minimum(bins.seg_len, K)

    # 4. composite fwd kernel only
    def cf(c, attrs, sl):
        out = rp.composite_tiles_pallas(
            attrs + (c % 2).astype(jnp.float32), (W, H), ts, 0.5, None, 1e-4,
            sl,
        )
        return tap(out) + c

    if not only_route:
        bench("composite_fwd", cf, (attrs, seg_len_c))
    g_tiles = jax.jit(
        lambda attrs, sl: rp.composite_tiles_pallas(
            attrs, (W, H), ts, 0.5, None, 1e-4, sl
        )
        * 0.5
    )(attrs, seg_len_c)

    # 4b. composite fwd v2 (seg_len-bounded, early-out)
    for D in (128, 256) if not only_route else ():
        bench(
            f"composite_fwd_v2_D{D}",
            lambda c, attrs, sl, D=D: tap(
                rp.composite_tiles_pallas(
                    attrs + (c % 2).astype(jnp.float32), (W, H), ts, 0.5, D,
                    1e-4, sl,
                )
            )
            + c,
            (attrs, seg_len_c),
        )

    # 5. composite bwd kernel only
    def cb(c, attrs, gt, sl):
        out = rp.composite_tiles_pallas_bwd(
            attrs + (c % 2).astype(jnp.float32), gt, (W, H), ts, 0.5, None,
            1e-4, sl,
        )
        return tap(out) + c

    if not only_route:
        bench("composite_bwd", cb, (attrs, g_tiles, seg_len_c))
    for D in (128, 256) if not only_route else ():
        bench(
            f"composite_bwd_v2_D{D}",
            lambda c, attrs, gt, sl, D=D: tap(
                rp.composite_tiles_pallas_bwd(
                    attrs + (c % 2).astype(jnp.float32), gt, (W, H), ts, 0.5,
                    D, 1e-4, sl,
                )
            )
            + c,
            (attrs, g_tiles, seg_len_c),
        )

    slot_grads = jax.jit(
        lambda attrs, gt, sl: rp.composite_tiles_pallas_bwd(
            attrs, gt, (W, H), ts, 0.5, None, 1e-4, sl
        )
    )(attrs, g_tiles, seg_len_c)

    # 6. grad-routing sort: slot keys (attr row 9) + 9 grad columns + dummies
    def fg(c, sg, attrs, kog):
        keys_slot = (
            attrs[:, rp.KEY_ROW, :].astype(jnp.int32) - 1
        ).reshape(T * K)
        keys_slot = jnp.where(keys_slot < 0, N - 1, keys_slot)
        dummy = jnp.where(kog >= 0, kog, N - 1)
        keys_all = jnp.concatenate([keys_slot, dummy])
        zn = jnp.zeros((N,), jnp.float32)
        cols = tuple(
            jnp.concatenate(
                [sg[:, a, :].reshape(T * K) + (c % 2).astype(jnp.float32), zn]
            )
            for a in range(9)
        )
        srt = jax.lax.sort((keys_all,) + cols, num_keys=1)
        return tap(srt[3]) + c

    bench("grad_sort", fg, (slot_grads, attrs, bins.key_of_gauss))

    keys_slot = (
        attrs[:, rp.KEY_ROW, :].astype(jnp.int32) - 1
    ).reshape(T * K)
    keys_slot = jnp.where(keys_slot < 0, N - 1, keys_slot)
    dummy = jnp.where(bins.key_of_gauss >= 0, bins.key_of_gauss, N - 1)
    keys_all = jnp.concatenate([keys_slot, dummy])
    zn = jnp.zeros((N,), jnp.float32)
    cols = tuple(
        jnp.concatenate([slot_grads[:, a, :].reshape(T * K), zn])
        for a in range(9)
    )
    srt = jax.lax.sort((keys_all,) + cols, num_keys=1)
    keys_srt = srt[0]
    vals_T = jnp.stack(srt[1:], axis=0)

    # 7. segsum (column layout)
    def sgs(c, vt, ks):
        s = segment_sum_sorted(
            vt + (c % 2).astype(jnp.float32), ks, N, raw=True,
            cols_layout=True,
        )
        return tap(s[:N, :9]) + c

    bench("segsum_cols", sgs, (vals_T, keys_srt))
    sums_raw = jax.jit(
        lambda vt, ks: segment_sum_sorted(
            vt, ks, N, raw=True, cols_layout=True
        )
    )(vals_T, keys_srt)

    # 8. final per-gaussian expansion (ops/expand)
    EB = 256
    nbl = -(-N // EB)
    base = jnp.asarray(
        np.pad(np.asarray(bins.vid), (0, nbl * EB - N), mode="edge")[::EB]
    )
    bench(
        "seg_to_gauss_expand",
        lambda c, s, k, b: tap(
            expand_rows(s + (c % 2).astype(jnp.float32), k, b, EB, out_cols=9)
        )
        + c,
        (sums_raw, bins.key_of_gauss, base),
    )


if __name__ == "__main__":
    main()
