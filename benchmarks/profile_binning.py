"""Sub-stage timing of ops/binning.bin_gaussians at bench scale.

Chained-rep harness (see NOTES.md: the axon tunnel's block_until_ready does
not reliably sync, so each stage chains R reps inside one jit with a
data-dependent carry and fetches one scalar). Prints one JSON line per stage.

Stages mirror the CURRENT pipeline (module docstring of ops/binning):
spans -> base searchsorted -> fused span-expansion transport + pair
arithmetic -> 2-key pair sort (with payloads) -> segment bounds.
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
    from simplegaussiansplat_tk71_tpu.ops.expand import expand_spans

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
    mean2d = proj.mean2d[0]  # (2, Nc) — capacity may round N up
    N = mean2d.shape[1]
    bbox_half = proj.bbox_half[0]
    depth = proj.depth[0]
    valid = proj.valid[0]
    attrs = jnp.concatenate(
        [proj.mean2d[0], proj.conic[0], proj.opacity[0][None], proj.color[0]],
        axis=0,
    )  # (9, N)
    K = Kmax
    P = P_cap

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

    def noop(c, x):
        return c + x[0].astype(jnp.int32)

    @jax.jit
    def cal(c0, x):
        return jax.lax.fori_loop(0, R, lambda _, c: noop(c, x), c0)

    float(cal(jnp.int32(0), depth))
    t0 = time.time()
    float(cal(jnp.int32(1), depth))
    overhead[0] = (time.time() - t0) * 1e3
    log(f"fetch overhead: {overhead[0]:.1f} ms")

    # --- spans + cumsum + src stack (per-gaussian work) ---
    def s_spans(c, mean2d, bbox_half, depth, valid):
        m2 = mean2d + (c % 2).astype(jnp.float32)
        x0 = jnp.clip(jnp.floor((m2[0] - bbox_half[0]) / ts), 0, ntx - 1)
        x1 = jnp.clip(jnp.floor((m2[0] + bbox_half[0]) / ts), 0, ntx - 1)
        y0 = jnp.clip(jnp.floor((m2[1] - bbox_half[1]) / ts), 0, nty - 1)
        y1 = jnp.clip(jnp.floor((m2[1] + bbox_half[1]) / ts), 0, nty - 1)
        tx0 = jnp.where(valid, x0.astype(jnp.int32), jnp.int32(1 << 20))
        span_w = jnp.where(valid, (x1 - x0).astype(jnp.int32) + 1, 1)
        span_h = jnp.where(valid, (y1 - y0).astype(jnp.int32) + 1, 1)
        counts = span_w * span_h
        cum = jnp.cumsum(counts)
        return tx0[12345] + cum[5000] + y0[77].astype(jnp.int32) + c

    bench("spans_cumsum", s_spans, (mean2d, bbox_half, depth, valid))

    # one real binning to harvest intermediates for isolated stages
    counts_np = None
    x0 = jnp.clip(jnp.floor((mean2d[0] - bbox_half[0]) / ts), 0, ntx - 1)
    x1 = jnp.clip(jnp.floor((mean2d[0] + bbox_half[0]) / ts), 0, ntx - 1)
    y0 = jnp.clip(jnp.floor((mean2d[1] - bbox_half[1]) / ts), 0, nty - 1)
    y1 = jnp.clip(jnp.floor((mean2d[1] + bbox_half[1]) / ts), 0, nty - 1)
    tx0 = jnp.where(valid, x0.astype(jnp.int32), jnp.int32(1 << 20))
    ty0 = jnp.where(valid, y0.astype(jnp.int32), 0)
    span_w = jnp.where(valid, (x1 - x0).astype(jnp.int32) + 1, 1)
    span_h = jnp.where(valid, (y1 - y0).astype(jnp.int32) + 1, 1)
    counts = span_w * span_h
    cum = jnp.cumsum(counts)
    cum_c = jnp.minimum(cum, P + 1)
    off_c = jnp.minimum(cum - counts, P + 1)
    vid = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32)) - 1, 0)

    EB = 256
    nb = -(-P // EB)
    starts = jnp.arange(nb, dtype=jnp.int32) * EB

    # --- base lookup (binary search on the cumsum) ---
    def s_base(c, cum_c):
        b = jnp.searchsorted(
            cum_c + (c % 2), starts, side="right"
        ).astype(jnp.int32)
        return b[500] + c

    bench("base_searchsorted", s_base, (cum_c,))

    base = jnp.searchsorted(cum_c, starts, side="right").astype(jnp.int32)

    cols = [
        tx0.astype(jnp.float32), ty0.astype(jnp.float32),
        span_w.astype(jnp.float32), off_c.astype(jnp.float32),
        jnp.maximum(depth, 0.0), vid.astype(jnp.float32),
        cum_c.astype(jnp.float32), jnp.arange(N, dtype=jnp.float32),
    ] + [attrs[a] for a in range(9)]
    src = jnp.stack(cols, axis=1)
    src_p = jnp.pad(src, ((0, EB * 8 + 8), (0, 0)))

    # --- fused span-expansion transport (17 columns) ---
    def s_expand(c, src_p, base):
        rowsT = expand_spans(src_p + (c % 2).astype(jnp.float32), base, P, EB)
        return rowsT[4, 123456].astype(jnp.int32) + c

    bench("expand_spans_17col", s_expand, (src_p, base))

    rowsT = expand_spans(src_p, base, P, EB)

    # --- pair arithmetic + 2-key sort with 11 payloads ---
    def s_sort(c, rowsT):
        rT = rowsT + (c % 2).astype(jnp.float32)
        j = jnp.arange(P, dtype=jnp.int32)
        span_w_p = jnp.maximum(rT[2].astype(jnp.int32), 1)
        local = j - rT[3].astype(jnp.int32)
        lx = local % span_w_p
        ly = local // span_w_p
        tile = (rT[1].astype(jnp.int32) + ly) * ntx + rT[0].astype(jnp.int32) + lx
        tile = jnp.where((j < cum[-1]) & (tile < T), tile, T).astype(jnp.int32)
        db = jax.lax.bitcast_convert_type(rT[4], jnp.int32)
        ops = (tile, db, rT[7].astype(jnp.int32), rT[5].astype(jnp.int32)) + tuple(
            jax.lax.bitcast_convert_type(rT[8 + a], jnp.int32) for a in range(9)
        )
        out = jax.lax.sort(ops, num_keys=2)
        return out[0][98765] + out[5][4321] + c

    bench("pair_arith_sort", s_sort, (rowsT,))

    # --- full binning (routed config: attrs carried, no table) ---
    def full(c, mean2d, bbox_half, depth, valid, attrs):
        bins = binning.bin_gaussians(
            mean2d + (c % 2).astype(jnp.float32), bbox_half, depth, valid,
            (W, H), tile_size=ts, max_pairs=P, max_per_tile=K,
            build_table=False, attrs=attrs,
        )
        return bins.seg_len[777] + bins.key_s[12345] + c

    bench("full_binning_routed", full, (mean2d, bbox_half, depth, valid, attrs))

    # --- full binning with table (XLA/tile-sharded config) ---
    def fullt(c, mean2d, bbox_half, depth, valid):
        bins = binning.bin_gaussians(
            mean2d + (c % 2).astype(jnp.float32), bbox_half, depth, valid,
            (W, H), tile_size=ts, max_pairs=P, max_per_tile=K,
            build_table=True,
        )
        return bins.ids[100, 5] + bins.seg_len[777] + c

    bench("full_binning_table", fullt, (mean2d, bbox_half, depth, valid))

    bins = binning.bin_gaussians(
        mean2d, bbox_half, depth, valid, (W, H), tile_size=ts,
        max_pairs=P, max_per_tile=K, build_table=False, attrs=attrs,
    )
    log(
        "pairs:", int(bins.num_pairs), "dropped:", int(bins.dropped_pairs),
        "truncated:", int(bins.truncated),
    )


if __name__ == "__main__":
    main()
