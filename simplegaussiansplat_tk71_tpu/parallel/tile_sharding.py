"""Tile-sharded rendering: ONE camera's tiles split across chips.

Data parallelism over cameras (parallel/sharding.py) needs batch >= chips.
This path scales a single camera: every chip projects (replicated — a small
fraction of the step), then BINS AND RASTERIZES ONLY ITS OWN BAND of tile
rows: gaussians whose boxes miss the band are culled before pair expansion,
so the per-chip pair buffer, binning sort, and compositor all shrink with
the device count (round-5; previously the binning ran replicated at full
max_pairs on every chip — NOTES backlog #6 / VERDICT r4 next #7). Band
images are all-gathered to assemble the frame. In the backward pass the
all_gather transposes to a psum_scatter routing each tile's cotangent back
to its owner chip, and the replicated-parameter gradients are pmean'd (each
chip holds d x its own tiles' contribution; the mean over chips is the
exact total).

Band-local binning reproduces the global pair set exactly: a gaussian's
global tile span is its box clipped into the full grid, so a chip keeps the
gaussians whose CLIPPED span overlaps its rows and re-derives the in-band
span in band-local coordinates (the same clip math on the shifted origin).
One deviation exists only when cull_alpha_min > 0: the first-pair cull
exemption (ops/binning) is per band rather than global, so a later band may
keep one sub-threshold pair (alpha < cull_alpha_min) per gaussian that the
single-chip path culls — bounded by cull_alpha_min per pixel and irrelevant
for gradients (the sliced reduction is dummy-augmented regardless).

This realizes the "tiles sharded across chips" rung of the benchmark ladder
(BASELINE.md items 4-5; the reference is strictly single-GPU, SURVEY.md 2b).
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from simplegaussiansplat_tk71_tpu.ops import binning, projection, rasterize


def _num_tiles(img_wh, tile_size):
    ntx = -(-int(img_wh[0]) // tile_size)
    nty = -(-int(img_wh[1]) // tile_size)
    return ntx, nty, ntx * nty


def make_tile_sharded_render(
    mesh, img_wh, config, axis_name: str = "data",
    local_pairs_factor: float = 2.0,
):
    """Returns render_fn(params, alive, Pm, Km) -> (M, H, W, 3) images,
    with each camera's tiles sharded over the mesh axis as contiguous bands
    of tile rows (the row count is padded to a multiple of the axis size).
    Cameras and params are replicated.

    local_pairs_factor: per-chip pair capacity = factor * max_pairs / n_dev
    (capped at max_pairs; rounded up to 128). Bands are not perfectly
    balanced, so the factor leaves headroom over the uniform share; overflow
    is counted in the binning's dropped_pairs, never silent."""
    n_dev = mesh.shape[axis_name]
    ntx, nty, T = _num_tiles(img_wh, config.tile_size)
    band_rows = -(-nty // n_dev)  # tile rows per chip (last bands may pad)
    T_local = ntx * band_rows
    ts = config.tile_size
    width, height = int(img_wh[0]), int(img_wh[1])
    band_wh = (ntx * ts, band_rows * ts)  # band-local "image" (full rows)
    if config.max_pairs is None:
        local_pairs = None  # binning default (8N) — nothing to scale
    else:
        local_pairs = min(
            config.max_pairs,
            -(-int(config.max_pairs * local_pairs_factor / n_dev) // 128)
            * 128,
        )

    def per_camera(mean2d, conic, depth, color, opacity, bbox_half, valid):
        idx = jax.lax.axis_index(axis_name)
        row0 = idx * band_rows
        # band ownership via the gaussian's GLOBAL clipped tile span (the
        # same clip ops/binning applies), so band-local binning reproduces
        # the global pair assignment exactly — including the edge-clamp
        # quirk where fully off-image boxes land in the border tiles
        y0_t = jnp.clip(
            jnp.floor((mean2d[1] - bbox_half[1]) / ts), 0, nty - 1
        ).astype(jnp.int32)
        y1_t = jnp.clip(
            jnp.floor((mean2d[1] + bbox_half[1]) / ts), 0, nty - 1
        ).astype(jnp.int32)
        valid_band = valid & (y1_t >= row0) & (y0_t < row0 + band_rows)
        shift = jnp.stack(
            [jnp.zeros_like(row0), row0 * ts]
        ).astype(jnp.float32)[:, None]
        mean2d_l = mean2d - shift  # band-local pixel coords
        # same fast pipeline as render.render_params: routed pair-space
        # kernels + alpha-floor cull, restricted to this chip's band
        routed = config.use_pallas and config.pair_grad_route
        # attrs required whenever the alpha cull is on (see render.py)
        packed = (
            jnp.concatenate([mean2d_l, conic, opacity[None], color], axis=0)
            if routed or config.cull_alpha_min > 0.0
            else None
        )
        bins = binning.bin_gaussians(
            mean2d_l, bbox_half, depth, valid_band, band_wh,
            tile_size=config.tile_size,
            max_pairs=local_pairs,
            max_per_tile=config.max_per_tile,
            build_table=not routed,
            attrs=packed,
            cull_alpha_min=config.cull_alpha_min,
        )
        tile_idx = jnp.arange(T_local, dtype=jnp.int32)  # band-local ids
        if routed:
            from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
                rasterize_tile_block_pallas_routed,
            )

            local = rasterize_tile_block_pallas_routed(
                bins, mean2d_l, conic, color, opacity,
                tile_idx, band_wh,
                tile_size=config.tile_size,
                pixel_offset=config.pixel_offset,
                depth_block=config.depth_block,
                t_eps=config.t_eps,
                max_per_tile=config.max_per_tile,
            )  # (T_local, ts, ts, 3)
        elif config.use_pallas:
            from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
                rasterize_tile_block_pallas,
            )

            local = rasterize_tile_block_pallas(
                bins.ids, bins.mask, mean2d_l, conic, color, opacity,
                tile_idx, band_wh,
                tile_size=config.tile_size,
                pixel_offset=config.pixel_offset,
                depth_block=config.depth_block,
                t_eps=config.t_eps,
            )  # (T_local, ts, ts, 3)
        else:
            local = rasterize.rasterize_tile_block(
                bins.ids, bins.mask, mean2d_l, conic, color, opacity,
                tile_idx, band_wh,
                tile_size=config.tile_size,
                tile_chunk=min(config.tile_chunk, T_local),
                pixel_offset=config.pixel_offset,
            )  # (T_local, ts, ts, 3)
        tiles = jax.lax.all_gather(
            local, axis_name, axis=0, tiled=True
        )  # (n_dev * T_local = ntx * nty_pad, ts, ts, 3) — bands are
        # contiguous row blocks, so this IS the global row-major tile order
        nty_pad = band_rows * n_dev
        image = (
            tiles.reshape(nty_pad, ntx, ts, ts, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(nty_pad * ts, ntx * ts, 3)[:height, :width]
        )
        return image, bins.truncated, bins.dropped_pairs

    def render_fn(
        params, alive, Pm, Km, with_visible: bool = False, mean2d_probe=None
    ):
        proj = projection.project(
            params["mean"], params["quat"], params["log_scale"],
            params["logit_opacity"], params["sh"], Pm, Km, img_wh,
            sh_degree=config.sh_degree, bbox_max_frac=config.bbox_max_frac,
            alive=alive, snap_mean_to_int=config.snap_mean_to_int,
        )
        if mean2d_probe is not None:
            proj = proj._replace(mean2d=proj.mean2d + mean2d_probe)
        # lax.map, not vmap: cameras composite sequentially so the P-sized
        # binning buffers exist once, and the routed pallas kernels (manual
        # DMA) trace normally instead of under a batching transform (same
        # reasoning as render.render_params)
        images, truncated, dropped = jax.lax.map(
            lambda a: per_camera(*a),
            (
                proj.mean2d, proj.conic, proj.depth, proj.color,
                proj.opacity, proj.bbox_half, proj.valid,
            ),
        )
        if with_visible:
            # same visibility stats as the single-chip path (render.RenderAux):
            # projection is replicated across chips, so these are exact on
            # every chip. truncated/dropped are per-CHIP (this band's
            # overflow); the step psums them into scene totals.
            vis_aux = (
                jnp.any(proj.valid, axis=0),
                jnp.sum(proj.valid, axis=0).astype(jnp.int32),
                jnp.max(jnp.max(proj.bbox_half, axis=1) * proj.valid, axis=0),
                jnp.sum(truncated).astype(jnp.int32),
                jnp.sum(dropped).astype(jnp.int32),
            )
            return images, vis_aux
        return images

    # observability: tests assert the per-chip buffers actually shrink
    render_fn.local_pairs = local_pairs
    render_fn.band_rows = band_rows
    return render_fn


def make_tile_sharded_train_step(
    mesh, config, render_cfg, img_wh, optimizer, axis_name: str = "data"
):
    """Jitted tile-sharded train step with the same signature as
    parallel.sharding.make_sharded_train_step (cameras REPLICATED here)."""
    from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
    from simplegaussiansplat_tk71_tpu.train.loss import photometric_loss

    render_fn = make_tile_sharded_render(mesh, img_wh, render_cfg, axis_name)

    W, H = float(img_wh[0]), float(img_wh[1])

    def step(params, alive, opt_state, stats, Pm, Km, target):
        B = Pm.shape[0]
        N = params["mean"].shape[-1]

        def loss_fn(params, probe):
            images, vis_aux = render_fn(
                params, alive, Pm, Km, with_visible=True, mean2d_probe=probe
            )
            loss, (l1, dssim) = photometric_loss(
                images, target, config.loss_lambda, config.ssim_window
            )
            return loss, (l1, dssim, vis_aux)

        probe = jnp.zeros((B, 2, N), jnp.float32)
        (
            (loss, (l1, dssim, (visible, vis_count, radius, trunc, dropped))),
            (grads, grad2d),
        ) = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            params, probe
        )
        # each chip's grads = n_dev x its tiles' share; mean = exact total.
        # The probe grad is each chip's tile-slice share: SUM = exact total.
        grads = jax.lax.pmean(grads, axis_name)
        grad2d = jax.lax.psum(grad2d, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        gnorm = jnp.linalg.norm(grads["mean"], axis=0)
        g2 = grad2d * jnp.asarray(
            [0.5 * W * B, 0.5 * H * B], jnp.float32
        ).reshape(1, 2, 1)
        g2n = jnp.sum(jnp.sqrt(jnp.sum(jnp.square(g2), axis=1)), axis=0)
        # true frustum visibility (render.RenderAux.visible semantics), not
        # the gnorm > 0 proxy — densify thresholds divide by visible_count,
        # so the proxy skewed them for visible-but-zero-grad gaussians
        stats = DensifyStats(
            grad_norm_accum=stats.grad_norm_accum + gnorm,
            visible_count=stats.visible_count + visible.astype(jnp.int32),
            grad2d_accum=stats.grad2d_accum + g2n,
            vis2d_count=stats.vis2d_count + vis_count,
            max_radius2d=jnp.maximum(stats.max_radius2d, radius),
            # band-local binning (round-5): each chip counts its own band's
            # overflow; psum = the scene totals, same semantics as the
            # single-chip and DP paths
            truncated_accum=stats.truncated_accum
            + jax.lax.psum(trunc, axis_name),
            dropped_accum=stats.dropped_accum
            + jax.lax.psum(dropped, axis_name),
        )
        metrics = {"loss": loss, "l1": l1, "dssim": dssim}
        return params, opt_state, stats, metrics

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
