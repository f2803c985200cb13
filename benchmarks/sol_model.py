"""Speed-of-light accounting for the bench-scale train step (VERDICT r2 #7).

For every pipeline stage at the headline bench config (1M gaussians, 800x800,
K=1024, ~2.2M surviving pairs) this prints: measured per-step device time
(from the round-5 device trace, 2026-08-21: benchmarks/profile_trace.py ->
parse_trace.py, docs/artifacts/trace_r5.json; 91.4 ms step span — after the
max_pairs power-of-two fix, 2.2M -> 2^21, which halved both lax.sorts:
lax.sort PADS TO THE NEXT POWER OF TWO), modeled HBM bytes moved,
modeled MXU flops, the bound that dominates, the speed-of-light time on a
v5e chip, and % of SoL achieved.

The BYTES/FLOPS numbers are analytic models of what each stage must move /
compute (documented per stage below), not measurements; the TIMES are
measured. "SoL" = max(bytes / HBM_BW, flops / MXU_PEAK) — i.e. the stage
running perfectly overlapped at full memory bandwidth or full matrix-unit
throughput, whichever binds.

v5e (one chip): HBM 819 GB/s, MXU 197 bf16 Tflop/s (394 int8 Tops).
Source: public TPU v5e spec table.

Run: python benchmarks/sol_model.py [--json]
"""

import argparse
import json

HBM = 819e9  # B/s
MXU = 197e12  # bf16 flop/s
VPU = 3.2e12  # f32 elementwise flop/s (8x128 vregs x ~4 ALUs x ~0.8 GHz);
# order-of-magnitude only — used where a stage is clearly VPU-bound

# bench-scale shape constants
N = 1_000_000  # gaussians
PAIRS = 2_097_152  # pair-buffer capacity (2^21; true pairs ~1.96M after cull)
T = 50 * 50  # 16x16 tiles over 800x800
PTILE = 256  # pixels per tile
K = 1024  # per-tile slot capacity
D = 64  # depth-block size of the MXU log-space scans
PIX = 800 * 800

f4 = 4  # f32 bytes


def stage_rows():
    rows = []

    def add(name, meas_ms, nbytes, flops, note, vpu_flops=0):
        times = {
            "HBM": nbytes / HBM,
            "MXU": flops / MXU,
            "VPU": vpu_flops / VPU,
        }
        bound = max(times, key=times.get)
        sol = times[bound] * 1e3
        rows.append({
            "stage": name,
            "measured_ms": meas_ms,
            "model_GB": round(nbytes / 1e9, 3),
            "model_Gflop": round((flops + vpu_flops) / 1e9, 1),
            "bound": bound,
            "sol_ms": round(sol, 2),
            "pct_sol": round(100 * sol / meas_ms, 1) if meas_ms else None,
            "note": note,
        })

    # Projection fwd+bwd: read 14 param cols, write 9 attr cols (+grads in
    # bwd); ~300 flops/row (quat->R, covariance sandwich, SH eval deg 2).
    add(
        "projection fwd+bwd", 2.2,
        N * (14 + 9 + 14 + 9) * f4, N * 600,
        "row-parallel; (C, N) layouts are unpadded",
    )

    # Binning pair expansion (expand_spans 17-col one-hot MXU windows):
    # one read of the N-row rect table + one write of the PAIRS x 17 stream.
    add(
        "binning expand", 6.0,
        (N * 6 + PAIRS * 17) * f4, PAIRS * 17 * 2 * 128,
        "one-hot matmul windows; flops = 128-wide one-hot MACs",
    )

    # Binning sort: 1 packed key + 11 payload cols over PAIRS rows.
    # SoL model = LSD radix, 4 passes of 8 bits, read+write per pass.
    add(
        "binning sort (packed key, 11 payloads)", 13.6,
        4 * 2 * PAIRS * 12 * f4, 0,
        "XLA lax.sort; the radix-partition SoL row is kept for continuity "
        "but the radix was REFUTED on device (proto_radix_pass: one "
        "placement pass measures 71 ms vs the 2.2 ms model)",
    )

    # Pair-window attr table (windowed DMA gather into (T, 16, K)).
    add(
        "pair attr table", 2.2,
        (PAIRS * 10 + T * 16 * K) * f4, 0,
        "aligned-window DMA kernel (pair_attrs_to_table)",
    )

    # Composite forward: per-tile VMEM pipeline; HBM = attr stream in + image
    # out. MXU = strict-tri log-space scans per depth block, 3 bf16 passes
    # (bf16x3), 2*D^2*PTILE flops per block, K/D blocks per tile; plus the
    # Gauss-kernel eval (VPU, ~25 flop per (slot, pixel)).
    # avg true per-tile list length (seg_len early-out skips the K tail)
    seg = PAIRS / T  # ~880 at bench scale
    tri = 3 * 2 * D * D * PTILE * (seg // D + 1) * T
    add(
        "composite fwd", 14.6,
        (PAIRS * 10 + T * 8 * PTILE) * f4, tri,
        "MXU = log-space tri-matmul scans (bf16x3); VPU = Gauss-kernel "
        "eval, ~25 flop per (slot, pixel)",
        vpu_flops=seg * PTILE * T * 25,
    )

    # Composite backward: reads the same stream + suffix-sum scans (MXU
    # transpose trick) + writes (T, 16, K) slot grads; ~40 VPU flop per
    # (slot, pixel) across the five gradient formulas.
    add(
        "composite bwd", 22.4,
        (PAIRS * 10 + T * PTILE * 3 + T * 16 * K) * f4,
        2 * tri,
        "2x scans (cumprod replay + suffix cumsum); VPU-heavy grads",
        vpu_flops=seg * PTILE * T * 40,
    )

    # Grad routing: sort the (PAIRS, 10) grad stream by carried segment key...
    add(
        "grad-routing sort (incl. cond glue)", 15.0,
        4 * 2 * PAIRS * 10 * f4, 0,
        "cond envelope: 12.0 lean sort + 2.5 in-branch segsum + glue; "
        "same (refuted) radix SoL model as the binning sort",
    )

    # Segment sum pair->gaussian (MXU one-hot windows): read PAIRS x 9, write
    # N x 9.
    add(
        "grad segment sum (seg->gauss expand)", 1.2,
        (PAIRS * 9 + N * 9) * f4, PAIRS * 9 * 2 * 128,
        "ops/segsum one-hot MXU blocks + manual DMA output windows",
    )

    # Adam + stats + loss (SSIM conv) + host glue: the trace's "other"
    # bucket (12.57 ms) minus the separately-rowed projection (2.2).
    add(
        "optimizer+stats+loss tail", 8.9,
        (N * 14 * 3 * 2) * f4 + PIX * 3 * 20 * f4, PIX * 3 * 120,
        "Adam reads/writes mu/nu/param per col; SSIM separable conv",
    )

    # Copies/pads/layout glue + the searchsorted while loops (binning owner
    # lookup) — measured directly in the r4 trace buckets.
    add(
        "copies/pads + searchsorted",
        7.8,
        2 * PAIRS * 11 * f4, 0,
        "XLA-inserted copies/pads between ops; while-loop owner lookups",
    )

    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    rows = stage_rows()
    total_meas = sum(r["measured_ms"] for r in rows)
    total_sol = sum(r["sol_ms"] for r in rows)
    if args.json:
        print(json.dumps({
            "rows": rows,
            "total_measured_ms": round(total_meas, 1),
            "total_sol_ms": round(total_sol, 1),
            "overall_pct_sol": round(100 * total_sol / total_meas, 1),
        }, indent=2))
        return
    hdr = (f"{'stage':42s} {'meas ms':>8s} {'GB':>7s} {'Gflop':>8s} "
           f"{'bound':>5s} {'SoL ms':>7s} {'%SoL':>6s}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(
            f"{r['stage']:42s} {r['measured_ms']:8.1f} {r['model_GB']:7.3f} "
            f"{r['model_Gflop']:8.1f} {r['bound']:>5s} {r['sol_ms']:7.2f} "
            f"{r['pct_sol']:6.1f}"
        )
    print("-" * len(hdr))
    print(
        f"{'TOTAL (traced stages)':42s} {total_meas:8.1f} "
        f"{'':7s} {'':8s} {'':5s} {total_sol:7.2f} "
        f"{100 * total_sol / total_meas:6.1f}"
    )


if __name__ == "__main__":
    main()
