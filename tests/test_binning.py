import numpy as np
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.ops import binning
from simplegaussiansplat_tk71_tpu.ops.binning import TileBins


def _bins_to_dict(bins, T):
    out = {}
    ids = np.asarray(bins.ids)
    mask = np.asarray(bins.mask)
    for t in range(T):
        out[t] = list(ids[t][mask[t]])
    return out


def test_single_gaussian_single_tile():
    mean2d = jnp.array([[8.0, 8.0]])
    bbox = jnp.array([[2.0, 2.0]])
    depth = jnp.array([1.0])
    valid = jnp.array([True])
    bins = binning.bin_gaussians(mean2d.T, bbox.T, depth, valid, (32, 32), 16, 64, 8)
    d = _bins_to_dict(bins, 4)
    assert d == {0: [0], 1: [], 2: [], 3: []}
    assert int(bins.num_pairs) == 1


def test_gaussian_spanning_tiles():
    # centered on the 4-tile corner -> covers all 4 tiles
    mean2d = jnp.array([[16.0, 16.0]])
    bbox = jnp.array([[3.0, 3.0]])
    bins = binning.bin_gaussians(
        mean2d.T, bbox.T, jnp.array([1.0]), jnp.array([True]), (32, 32), 16,
        64, 8
    )
    d = _bins_to_dict(bins, 4)
    assert d == {0: [0], 1: [0], 2: [0], 3: [0]}
    assert int(bins.num_pairs) == 4


def test_depth_sorted_within_tile():
    rng = np.random.default_rng(0)
    n = 30
    mean2d = jnp.asarray(rng.uniform(0, 32, size=(n, 2)).astype(np.float32))
    bbox = jnp.full((n, 2), 1.5)
    depth = jnp.asarray(rng.uniform(1, 5, size=(n,)).astype(np.float32))
    valid = jnp.ones(n, bool)
    bins = binning.bin_gaussians(mean2d.T, bbox.T, depth, valid, (32, 32), 16, 512, 32)
    ids = np.asarray(bins.ids)
    mask = np.asarray(bins.mask)
    dd = np.asarray(depth)
    for t in range(4):
        seq = dd[ids[t][mask[t]]]
        assert (np.diff(seq) >= 0).all(), seq


def test_matches_bruteforce_overlap():
    rng = np.random.default_rng(1)
    n = 50
    W = H = 64
    ts = 16
    mean2d = rng.uniform(-5, W + 5, size=(n, 2)).astype(np.float32)
    bbox = rng.uniform(0.5, 10, size=(n, 2)).astype(np.float32)
    depth = rng.uniform(1, 5, size=(n,)).astype(np.float32)
    valid = rng.uniform(size=n) > 0.2
    bins = binning.bin_gaussians(
        jnp.asarray(mean2d.T), jnp.asarray(bbox.T), jnp.asarray(depth),
        jnp.asarray(valid), (W, H), ts, 2048, 64,
    )
    ntx = W // ts
    got = _bins_to_dict(bins, (W // ts) * (H // ts))
    for t, members in got.items():
        tx, ty = t % ntx, t // ntx
        expect = set()
        for g in range(n):
            if not valid[g]:
                continue
            # same span rule as the implementation: clipped floor of box edges
            x0 = min(max(np.floor((mean2d[g, 0] - bbox[g, 0]) / ts), 0), ntx - 1)
            x1 = min(max(np.floor((mean2d[g, 0] + bbox[g, 0]) / ts), 0), ntx - 1)
            y0 = min(max(np.floor((mean2d[g, 1] - bbox[g, 1]) / ts), 0), ntx - 1)
            y1 = min(max(np.floor((mean2d[g, 1] + bbox[g, 1]) / ts), 0), ntx - 1)
            if x0 <= tx <= x1 and y0 <= ty <= y1:
                expect.add(g)
        assert set(members) == expect, (t, sorted(members), sorted(expect))
    assert int(bins.dropped_pairs) == 0
    assert int(bins.truncated) == 0


def test_overflow_reported():
    n = 20
    mean2d = jnp.tile(jnp.array([[8.0, 8.0]]), (n, 1))
    bbox = jnp.full((n, 2), 1.0)
    depth = jnp.arange(n, dtype=jnp.float32)
    valid = jnp.ones(n, bool)
    bins = binning.bin_gaussians(
        mean2d.T, bbox.T, depth, valid, (16, 16), 16, max_pairs=64,
        max_per_tile=8
    )
    assert int(bins.truncated) == n - 8
    # the kept 8 are the nearest by depth
    ids = np.asarray(bins.ids[0][np.asarray(bins.mask[0])])
    assert set(ids) == set(range(8))


def test_expand_transport_matches_gather():
    """The pallas expand transport (dummy-pair construction) must reproduce
    the XLA gather transport exactly, including sort-carried attrs."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(7)
    n = 300
    mean2d = jnp.asarray(rng.uniform(0, 64, (2, n)).astype(np.float32) * [[1], [1]])
    bbox = jnp.asarray(rng.uniform(0.5, 12, (2, n)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.1, 9, n).astype(np.float32))
    valid = jnp.asarray(rng.random(n) < 0.8)
    attrs = jnp.asarray(rng.normal(size=(9, n)).astype(np.float32))
    kw = dict(
        img_wh=(64, 64), tile_size=16, max_pairs=2048, max_per_tile=32,
        build_table=True, attrs=attrs,
    )
    ref = binning.bin_gaussians(
        mean2d, bbox, depth, valid, expand_transport=False, **kw
    )
    with pltpu.force_tpu_interpret_mode():
        got = binning.bin_gaussians(
            mean2d, bbox, depth, valid, expand_transport=True, **kw
        )
    for name in TileBins._fields:
        a, b = getattr(ref, name), getattr(got, name)
        if a is None:
            assert b is None, name
            continue
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_cull_alpha_min_drops_unreachable_pairs():
    """Exact tile-intersection culling must only drop pairs whose gaussian
    cannot reach alpha >= 1/255 in the tile: the culled render differs from
    the exact-box render by less than a few alpha_min units per pixel."""
    from simplegaussiansplat_tk71_tpu.render import RenderConfig, render
    from simplegaussiansplat_tk71_tpu.models.gaussians import init_from_points
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(11)
    n = 400
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    xyz[:, 2] += 5
    model = init_from_points(xyz, rng.uniform(0.05, 0.4, n).astype(np.float32))
    sh = np.array(model.sh)
    sh[0:3, :n] = rng.uniform(0.5, 3, (n, 3)).T
    model = model._replace(sh=jnp.asarray(sh))
    P = jnp.asarray(np.eye(3, 4, dtype=np.float32)[None])
    K = jnp.asarray([[[60.0, 0, 64], [0, 60.0, 48], [0, 0, 1]]])
    base = dict(max_per_tile=128, max_pairs=8192, use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        img0, aux0 = render(model, P, K, (128, 96), RenderConfig(**base))
        img1, aux1 = render(
            model, P, K, (128, 96),
            RenderConfig(cull_alpha_min=1.0 / 255, **base),
        )
        img2, aux2 = render(
            model, P, K, (128, 96),
            RenderConfig(cull_alpha_min=1e-6, **base),
        )
    # 1/255 floor: error accumulates over culled sub-threshold terms (each
    # < alpha_min * color); bounded but visible
    diff = float(jnp.max(jnp.abs(img1 - img0)))
    assert diff < 0.1, diff
    assert diff > 0.0  # culling actually removed something
    # a tiny floor must be near-exact (conservative lower bound never culls
    # a contributing pair above it)
    diff2 = float(jnp.max(jnp.abs(img2 - img0)))
    assert diff2 < 1e-3, diff2


def test_cull_never_orphans_a_surviving_segment():
    """Gradient-routing invariant: every surviving gaussian (key_of_gauss
    >= 0) must keep at least one pair inside a tile window whenever
    truncated == 0 — the lean pair-space backward relies on gap-free sorted
    segment keys (ops/segsum increments<=1 precondition). An aggressive
    cull_alpha_min used to orphan segments whose every pair failed the
    alpha-reachability test; the first pair of each gaussian is now
    cull-exempt."""
    rng = np.random.default_rng(23)
    n = 500
    mean2d = jnp.asarray(rng.uniform(-10, 140, (2, n)).astype(np.float32))
    bbox = jnp.asarray(rng.uniform(0.5, 30, (2, n)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.1, 9, n).astype(np.float32))
    valid = jnp.asarray(rng.random(n) < 0.9)
    # tiny opacity + sharp conic -> most pairs fail a high alpha floor
    attrs = jnp.asarray(rng.normal(size=(9, n)).astype(np.float32))
    attrs = attrs.at[2].set(jnp.abs(attrs[2]) + 2.0)  # conic a
    attrs = attrs.at[3].set(0.0)  # conic b
    attrs = attrs.at[4].set(jnp.abs(attrs[4]) + 2.0)  # conic c
    attrs = attrs.at[5].set(0.02)  # opacity
    bins = binning.bin_gaussians(
        mean2d, bbox, depth, valid, (128, 96), 16, max_pairs=8192,
        max_per_tile=256, build_table=False, attrs=attrs,
        expand_transport=False, cull_alpha_min=0.015,
    )
    assert int(bins.truncated) == 0
    key_s = np.asarray(bins.key_s)
    seg_start = np.asarray(bins.seg_start)
    seg_len = np.asarray(bins.seg_len)
    in_table = set()
    for t in range(seg_start.shape[0]):
        s = seg_start[t]
        in_table.update(key_s[s : s + min(seg_len[t], 256)])
    n_live = int(bins.n_live)
    missing = set(range(n_live)) - in_table
    assert not missing, f"orphaned segments: {sorted(missing)[:10]}"
    assert n_live > 0 and int(jnp.sum(bins.seg_len)) > 0
