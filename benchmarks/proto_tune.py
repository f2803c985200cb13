"""Kernel-parameter A/B at bench scale: segsum block/inner, composite
tile_block. One process, chained-rep harness, overhead-subtracted."""

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
    from simplegaussiansplat_tk71_tpu.ops.segsum import segment_sum_sorted

    log("devices:", jax.devices())
    W = H = 800
    N = 1_000_000
    f = 600.0
    Kmax = 1024
    max_pairs = 2_200_000
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
        [proj.mean2d[0], proj.conic[0], proj.opacity[0][None], proj.color[0]],
        axis=0,
    )
    bins = jax.jit(
        lambda m2, bb, dp, vl, pk: binning.bin_gaussians(
            m2, bb, dp, vl, (W, H), tile_size=ts, max_pairs=max_pairs,
            max_per_tile=Kmax, build_table=False, attrs=pk,
        )
    )(proj.mean2d[0], proj.bbox_half[0], proj.depth[0], proj.valid[0], packed)
    K = Kmax
    NN = bins.key_of_gauss.shape[0]

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
    def cal(c0, x):
        return jax.lax.fori_loop(
            0, R, lambda _, c: c + x[0, 0].astype(jnp.int32) % 2, c0
        )

    float(cal(jnp.int32(0), packed))
    t0 = time.time()
    float(cal(jnp.int32(1), packed))
    overhead[0] = (time.time() - t0) * 1e3
    log(f"fetch overhead: {overhead[0]:.1f} ms")

    def tap(x):
        return x.reshape(-1)[::8191].sum().astype(jnp.int32) % 5

    attrs = jax.jit(
        lambda a_s, ks, ss, sl: rp._pair_table(a_s, ks, ss, sl, K)
    )(bins.attrs_s, bins.key_s, bins.seg_start, bins.seg_len)
    seg_len_c = jnp.minimum(bins.seg_len, K)

    # composite fwd/bwd at tile_block 4 and 8
    g_tiles = jax.jit(
        lambda a, sl: rp.composite_tiles_pallas(a, (W, H), ts, 0.5, None, 1e-4, sl)
        * 0.5
    )(attrs, seg_len_c)
    for TB in (4, 8):
        bench(
            f"composite_fwd_TB{TB}",
            lambda c, a, sl, TB=TB: tap(
                rp.composite_tiles_pallas(
                    a + (c % 2).astype(jnp.float32), (W, H), ts, 0.5, None,
                    1e-4, sl, tile_block=TB,
                )
            )
            + c,
            (attrs, seg_len_c),
        )
        bench(
            f"composite_bwd_TB{TB}",
            lambda c, a, gt, sl, TB=TB: tap(
                rp.composite_tiles_pallas_bwd(
                    a + (c % 2).astype(jnp.float32), gt, (W, H), ts, 0.5,
                    None, 1e-4, sl, tile_block=TB,
                )
            )
            + c,
            (attrs, g_tiles, seg_len_c),
        )

    # segsum block/inner sweep on realistic sorted keys
    slot_grads = jax.jit(
        lambda a, gt, sl: rp.composite_tiles_pallas_bwd(
            a, gt, (W, H), ts, 0.5, None, 1e-4, sl
        )
    )(attrs, g_tiles, seg_len_c)
    keys_slot = (attrs[:, rp.KEY_ROW, :].astype(jnp.int32) - 1).reshape(T * K)
    keys_slot = jnp.where(keys_slot < 0, NN - 1, keys_slot)
    dummy = jnp.where(bins.key_of_gauss >= 0, bins.key_of_gauss, NN - 1)
    keys_all = jnp.concatenate([keys_slot, dummy])
    zn = jnp.zeros((NN,), jnp.float32)
    cols = tuple(
        jnp.concatenate([slot_grads[:, a, :].reshape(T * K), zn])
        for a in range(9)
    )
    srt = jax.lax.sort((keys_all,) + cols, num_keys=1)
    keys_srt = srt[0]
    vals_T = jnp.stack(srt[1:], axis=0)
    for B, I in ((256, 8), (128, 16), (128, 32), (512, 4)):
        bench(
            f"segsum_B{B}_I{I}",
            lambda c, vt, ks, B=B, I=I: tap(
                segment_sum_sorted(
                    vt + (c % 2).astype(jnp.float32), ks, NN, block=B,
                    inner=I, raw=True, cols_layout=True,
                )[:NN, :9]
            )
            + c,
            (vals_T, keys_srt),
        )


if __name__ == "__main__":
    main()
