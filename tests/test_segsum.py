"""segment_sum_sorted pallas kernel vs jnp reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from simplegaussiansplat_tk71_tpu.ops.segsum import (
    segment_sum_sorted,
    segment_sum_sorted_masked,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _case(P, n_live, N, C=9, seed=0, block=64, inner=2):
    """Random sorted keys over a live prefix [0, n_live); values (P, C)."""
    rng = np.random.default_rng(seed)
    keys = np.sort(rng.integers(0, n_live, P).astype(np.int32))
    # ensure the prefix property: every rank < n_live appears at least once
    keys[:n_live] = np.arange(n_live, dtype=np.int32)
    keys = np.sort(keys)
    vals = rng.normal(size=(P, C)).astype(np.float32)
    ref = np.zeros((N, C), np.float32)
    np.add.at(ref, keys, vals)
    return jnp.asarray(vals), jnp.asarray(keys), ref


def test_matches_reference_small_blocks():
    vals, keys, ref = _case(P=1000, n_live=300, N=400, block=64, inner=2)
    out = segment_sum_sorted_masked(
        vals, keys, 400, n_live=jnp.int32(300), block=64, inner=2
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_rank_spanning_many_blocks():
    # one giant segment spanning several blocks plus a tail of singletons
    P, N = 600, 256
    rng = np.random.default_rng(1)
    keys = np.concatenate([
        np.zeros(400, np.int32),  # rank 0 spans > 6 blocks of 64
        np.arange(1, P - 400 + 1, dtype=np.int32),
    ])
    vals = rng.normal(size=(P, 5)).astype(np.float32)
    ref = np.zeros((N, 5), np.float32)
    np.add.at(ref, keys, vals)
    out = segment_sum_sorted_masked(
        jnp.asarray(vals), jnp.asarray(keys), N,
        n_live=jnp.int32(P - 400 + 1), block=64, inner=2,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


def test_block_boundary_alignment():
    # segments ending exactly at block boundaries
    B = 64
    keys = np.repeat(np.arange(8, dtype=np.int32), B)  # each rank = 1 block
    P = len(keys)
    vals = np.ones((P, 3), np.float32)
    ref = np.zeros((16, 3), np.float32)
    np.add.at(ref, keys, vals)
    out = segment_sum_sorted_masked(
        jnp.asarray(vals), jnp.asarray(keys), 16, n_live=jnp.int32(8),
        block=B, inner=2,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_under_lax_map():
    # the render path maps over cameras with lax.map; the kernel must trace
    # under scan
    vals, keys, ref = _case(P=512, n_live=100, N=128, C=4, seed=3, block=64)
    v2 = jnp.stack([vals, vals * 2.0])
    k2 = jnp.stack([keys, keys])

    def f(args):
        v, k = args
        return segment_sum_sorted_masked(
            v, k, 128, n_live=jnp.int32(100), block=64, inner=2
        )

    out = jax.lax.map(f, (v2, k2))
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out[1]), 2.0 * ref, rtol=1e-5, atol=1e-5
    )
