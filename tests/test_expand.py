"""expand_rows pallas kernel vs jnp reference (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from simplegaussiansplat_tk71_tpu.ops.expand import expand_rows


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _ref(src, keys):
    out = np.where(keys[:, None] >= 0, src[np.maximum(keys, 0)], 0.0)
    return out


def _run(src, clean, masked, block):
    nb = -(-len(masked) // block)
    pad = nb * block - len(clean)
    clean_p = np.pad(clean, (0, pad), mode="edge")
    base = clean_p[::block].astype(np.int32)
    # source must cover every superset window read (inner=8 blocks)
    S_need = int(base.max()) + block * 8
    if src.shape[0] < S_need:
        src = np.pad(src, ((0, S_need - src.shape[0]), (0, 0)))
    return np.asarray(
        expand_rows(
            jnp.asarray(src), jnp.asarray(masked), jnp.asarray(base), block
        )
    ), src


def test_expand_matches_gather():
    rng = np.random.default_rng(0)
    S, P, B = 300, 1000, 128
    src = rng.normal(size=(S, 16)).astype(np.float32)
    # nondecreasing clean keys with increments <= 1 (valid-compaction ranks)
    clean = np.cumsum(rng.integers(0, 2, size=P)).astype(np.int32)
    clean = np.minimum(clean, S - 1)
    masked = np.where(rng.random(P) < 0.3, -1, clean).astype(np.int32)
    out, src_p = _run(src, clean, masked, B)
    np.testing.assert_array_equal(out, _ref(src_p, masked))


def test_expand_exact_f32():
    # bf16x3 must reproduce the source rows bit-exactly (single 1.0*x product)
    rng = np.random.default_rng(1)
    src = (rng.normal(size=(64, 8)) * 1e-3).astype(np.float32)
    clean = np.arange(256, dtype=np.int32) // 4
    out, src_p = _run(src, clean, clean, 128)
    np.testing.assert_array_equal(out, src_p[clean])


def test_expand_all_masked_block():
    src = np.ones((140, 4), np.float32)
    clean = np.zeros(256, np.int32)
    masked = np.full(256, -1, np.int32)
    out, _ = _run(src, clean, masked, 128)
    np.testing.assert_array_equal(out, np.zeros((256, 4), np.float32))


def test_expand_spans_matches_owner_gather():
    """expand_spans (fused owner lookup) == src[owner(j)] with zero columns
    for unmatched outputs."""
    from simplegaussiansplat_tk71_tpu.ops.expand import expand_spans

    rng = np.random.default_rng(3)
    N, B = 500, 256
    counts = rng.integers(1, 9, size=N).astype(np.int64)
    cum = np.cumsum(counts)
    off = cum - counts
    total = int(cum[-1])
    P = total + 137  # outputs past total must be zero columns
    src = rng.normal(size=(N, 12)).astype(np.float32)
    src[:, 3] = np.minimum(off, P + 1)
    src[:, 6] = np.minimum(cum, P + 1)
    starts = np.arange(-(-P // B), dtype=np.int64) * B
    base = np.searchsorted(cum, starts, side="right").astype(np.int32)
    src_p = np.pad(src, ((0, B * 8 + 8), (0, 0)))
    out = np.asarray(
        expand_spans(jnp.asarray(src_p), jnp.asarray(base), P, B)
    )
    owner = np.searchsorted(cum, np.arange(P), side="right")
    ref = np.where(
        (np.arange(P) < total)[:, None],
        src_p[np.minimum(owner, N - 1)],
        0.0,
    ).T
    np.testing.assert_array_equal(out, ref)


def test_expand_unpadded_tail():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(64, 4)).astype(np.float32)
    P = 200  # not a multiple of block
    clean = np.minimum(np.cumsum(rng.integers(0, 2, size=P)), 63).astype(
        np.int32
    )
    out, src_p = _run(src, clean, clean, 128)
    assert out.shape == (P, 4)
    np.testing.assert_array_equal(out, _ref(src_p, clean))
