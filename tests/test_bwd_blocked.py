"""Blocked backward (_tile_grads_blocked) == full-K backward (_tile_grads).

The blocked path bounds gradient work by the tile's true list length and the
transmittance saturation point (SGS_BWD_BLOCKED); skipped slots must come out
as EXACT zeros and processed slots must match the single-pass full-K kernel.
Interpret-mode equality here; Mosaic lowering is validated on the chip by
benchmarks/device_check.py (run with SGS_BWD_BLOCKED=1).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
    NUM_ATTR_ROWS,
    composite_tiles_pallas_bwd,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _attr_table(T, K, seg_len, rng, W, H, ts=16, opacity_hi=0.6):
    """(T, 16, K) table: slots < seg_len[t] are live gaussians near tile t."""
    attrs = np.zeros((T, NUM_ATTR_ROWS, K), np.float32)
    ntx = -(-W // ts)
    for t in range(T):
        n = seg_len[t]
        if n == 0:
            continue
        cx = (t % ntx) * ts + ts / 2
        cy = (t // ntx) * ts + ts / 2
        attrs[t, 0, :n] = cx + rng.uniform(-ts, ts, n)
        attrs[t, 1, :n] = cy + rng.uniform(-ts, ts, n)
        attrs[t, 2, :n] = rng.uniform(0.02, 0.3, n)  # ca
        attrs[t, 4, :n] = rng.uniform(0.02, 0.3, n)  # cc
        attrs[t, 3, :n] = rng.uniform(-0.05, 0.05, n)  # cb (keep PSD-ish)
        attrs[t, 5, :n] = rng.uniform(0.05, opacity_hi, n)
        attrs[t, 6:9, :n] = rng.uniform(0, 1, (3, n))
    return attrs


def _run(attrs, seg_len, W, H, blocked, monkeypatch):
    monkeypatch.setenv("SGS_BWD_BLOCKED", "1" if blocked else "0")
    g_tiles = np.zeros((attrs.shape[0], 8, 16 * 16), np.float32)
    rng = np.random.default_rng(5)
    g_tiles[:, :3, :] = rng.normal(0, 1, g_tiles[:, :3, :].shape)
    return np.asarray(
        composite_tiles_pallas_bwd(
            jnp.asarray(attrs), jnp.asarray(g_tiles), (W, H), 16, 0.5,
            seg_len=jnp.asarray(seg_len, jnp.int32),
        )
    )


@pytest.mark.parametrize("K", [128, 256])
def test_blocked_matches_full_varied_seg_len(K, monkeypatch):
    W = H = 32
    T = 4
    rng = np.random.default_rng(0)
    seg_len = np.array([0, 3, K // 2 + 5, K], np.int32)
    attrs = _attr_table(T, K, seg_len, rng, W, H)
    full = _run(attrs, seg_len, W, H, False, monkeypatch)
    blk = _run(attrs, seg_len, W, H, True, monkeypatch)
    np.testing.assert_allclose(blk, full, rtol=2e-5, atol=1e-6)


def test_blocked_saturation_early_out_is_exact(monkeypatch):
    """A tile stacked with near-opaque gaussians saturates transmittance
    mid-list; the blocked kernel stops early and the skipped slots' grads
    must be exact zeros — which is also what the full-K math yields."""
    W = H = 16
    T = 1
    K = 512
    rng = np.random.default_rng(1)
    seg_len = np.array([K], np.int32)
    attrs = _attr_table(T, K, seg_len, rng, W, H, opacity_hi=0.995)
    # pile the first 64 gaussians dead-center with big footprints so every
    # pixel saturates fast
    attrs[0, 0, :64] = 8.0
    attrs[0, 1, :64] = 8.0
    attrs[0, 2, :64] = 0.01
    attrs[0, 4, :64] = 0.01
    attrs[0, 3, :64] = 0.0
    attrs[0, 5, :64] = 0.99
    full = _run(attrs, seg_len, W, H, False, monkeypatch)
    blk = _run(attrs, seg_len, W, H, True, monkeypatch)
    np.testing.assert_allclose(blk, full, rtol=2e-5, atol=1e-6)
    # the deep tail (far past saturation) is vanishingly small in both —
    # transmittance decays through denormals before underflowing to the
    # exact 0.0f that triggers the blocked early-exit, so the two paths
    # agree without the tail being literally zero
    assert np.max(np.abs(full[0, :9, 300:])) < 1e-12
    assert np.max(np.abs(blk[0, :9, 300:])) < 1e-12
