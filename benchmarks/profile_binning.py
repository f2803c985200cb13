"""Sub-stage timing of ops/binning.bin_gaussians at bench scale.

Each stage is jitted in isolation (block_until_ready between reps) so the
~100 ms binning cost can be attributed before optimizing. Prints one JSON
line per stage.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, n=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from simplegaussiansplat_tk71_tpu.ops import projection

    log("devices:", jax.devices())
    W = H = 800
    N = 1_000_000
    f = 600.0
    Kmax = int(os.environ.get("SGS_BENCH_K", "1024"))
    P_cap = int(os.environ.get("SGS_BENCH_MAX_PAIRS", "2500000"))
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
    mean2d = proj.mean2d[0]
    bbox_half = proj.bbox_half[0]
    depth = proj.depth[0]
    valid = proj.valid[0]
    K = Kmax

    # --- stage 1: depth argsort + span computation ---
    def s1(mean2d, bbox_half, depth, valid):
        order = jnp.argsort(jnp.where(valid, depth, jnp.inf)).astype(jnp.int32)
        m2 = mean2d[order]
        bb = bbox_half[order]
        x0 = jnp.clip(jnp.floor((m2[:, 0] - bb[:, 0]) / ts), 0, ntx - 1)
        x1 = jnp.clip(jnp.floor((m2[:, 0] + bb[:, 0]) / ts), 0, ntx - 1)
        y0 = jnp.clip(jnp.floor((m2[:, 1] - bb[:, 1]) / ts), 0, nty - 1)
        y1 = jnp.clip(jnp.floor((m2[:, 1] + bb[:, 1]) / ts), 0, nty - 1)
        tx0 = x0.astype(jnp.int32)
        ty0 = y0.astype(jnp.int32)
        span_w = (x1 - x0).astype(jnp.int32) + 1
        span_h = (y1 - y0).astype(jnp.int32) + 1
        counts = jnp.where(valid[order], span_w * span_h, 0)
        return order, tx0, ty0, span_w, counts

    order, tx0, ty0, span_w, counts = timeit(
        "depth_sort_spans", jax.jit(s1), mean2d, bbox_half, depth, valid
    )

    # --- stage 2: owner lookup (histogram + cumsum) ---
    def s2(counts):
        cum = jnp.cumsum(counts)
        hist = jnp.zeros((P_cap,), jnp.int32).at[
            jnp.minimum(cum, P_cap - 1)
        ].add(1, mode="drop")
        g = jnp.minimum(jnp.cumsum(hist), N - 1)
        return g, cum

    g, cum = timeit("owner_hist_cumsum", jax.jit(s2), counts)

    # --- stage 3: pair expansion (packed gather + arithmetic) ---
    def s3(g, cum, counts, tx0, ty0, span_w, order):
        offsets = cum - counts
        total = cum[-1]
        j = jnp.arange(P_cap, dtype=jnp.int32)
        packed = jnp.stack([tx0, ty0, span_w, offsets, order], axis=1)
        rows = packed[g]
        local = j - rows[:, 3]
        lx = local % rows[:, 2]
        ly = local // rows[:, 2]
        tile = (rows[:, 1] + ly) * ntx + (rows[:, 0] + lx)
        tile = jnp.where(j < total, tile, T).astype(jnp.int32)
        return tile, rows[:, 4]

    tile, gid = timeit(
        "pair_expand_gather", jax.jit(s3), g, cum, counts, tx0, ty0, span_w,
        order,
    )

    # --- stage 4: main pair sort by tile ---
    def s4(tile, gid):
        j = jnp.arange(P_cap, dtype=jnp.int32)
        return jax.lax.sort((tile, gid, j), num_keys=1, is_stable=True)

    tile_s, gid_s, dm_idx = timeit("pair_sort_tile", jax.jit(s4), tile, gid)

    # --- stage 5: segment extraction -> dense table ---
    def s5(tile_s, gid_s):
        tids = jnp.arange(T, dtype=jnp.int32)
        seg_start = jnp.searchsorted(tile_s, tids, side="left").astype(
            jnp.int32
        )
        seg_end = jnp.searchsorted(tile_s, tids, side="right").astype(
            jnp.int32
        )
        seg_len = seg_end - seg_start
        k = jnp.arange(K, dtype=jnp.int32)
        gather_idx = jnp.minimum(seg_start[:, None] + k[None, :], P_cap - 1)
        ids = gid_s[gather_idx]
        mask = k[None, :] < jnp.minimum(seg_len, K)[:, None]
        return ids, mask, seg_start

    ids, mask, seg_start = timeit("segments_table", jax.jit(s5), tile_s, gid_s)

    # --- stage 6: routing tables (two inverse-permutation sorts) ---
    def s6(tile_s, dm_idx, seg_start, order):
        j = jnp.arange(P_cap, dtype=jnp.int32)
        t_q = jnp.minimum(tile_s, T - 1)
        k_q = j - seg_start[t_q]
        in_table = (tile_s < T) & (k_q < K)
        slot_q = jnp.where(in_table, t_q * K + k_q, T * K).astype(jnp.int32)
        _, slot_of_dm = jax.lax.sort((dm_idx, slot_q), num_keys=1)
        _, inv_rank = jax.lax.sort(
            (order, jnp.arange(order.shape[0], dtype=jnp.int32)), num_keys=1
        )
        return slot_of_dm, inv_rank

    timeit("routing_tables", jax.jit(s6), tile_s, dm_idx, seg_start, order)

    # --- full binning for comparison ---
    from simplegaussiansplat_tk71_tpu.ops import binning

    def full(mean2d, bbox_half, depth, valid):
        return binning.bin_gaussians(
            mean2d, bbox_half, depth, valid, (W, H), tile_size=ts,
            max_pairs=P_cap, max_per_tile=K,
        )

    bins = timeit("full_binning", jax.jit(full), mean2d, bbox_half, depth, valid)
    log("pairs:", int(bins.num_pairs))


if __name__ == "__main__":
    main()
