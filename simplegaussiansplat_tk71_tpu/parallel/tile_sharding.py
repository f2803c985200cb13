"""Tile-sharded rendering: ONE camera's tiles split across chips.

Data parallelism over cameras (parallel/sharding.py) needs batch >= chips.
This path scales a single camera: every chip projects and bins (replicated
compute — projection/binning are a small fraction of the step), rasterizes its
own contiguous slice of the tile grid, and all-gathers tile images to
assemble the frame. In the backward pass the all_gather transposes to a
psum_scatter routing each tile's cotangent back to its owner chip, and the
replicated-parameter gradients are pmean'd (each chip holds d x its own
tiles' contribution; the mean over chips is the exact total).

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


def make_tile_sharded_render(mesh, img_wh, config, axis_name: str = "data"):
    """Returns render_fn(params, alive, Pm, Km) -> (M, H, W, 3) images,
    with each camera's tiles sharded over the mesh axis. Cameras and params
    are replicated; the tile grid must divide evenly by the axis size
    (it is padded internally otherwise)."""
    n_dev = mesh.shape[axis_name]
    ntx, nty, T = _num_tiles(img_wh, config.tile_size)
    T_pad = -(-T // n_dev) * n_dev
    shard = T_pad // n_dev
    ts = config.tile_size
    width, height = int(img_wh[0]), int(img_wh[1])

    def per_camera(mean2d, conic, depth, color, opacity, bbox_half, valid):
        # same fast pipeline as render.render_params: routed pair-space
        # kernels + alpha-floor cull, restricted to this chip's tile slice
        routed = config.use_pallas and config.pair_grad_route
        # attrs required whenever the alpha cull is on (see render.py)
        packed = (
            jnp.concatenate([mean2d, conic, opacity[None], color], axis=0)
            if routed or config.cull_alpha_min > 0.0
            else None
        )
        bins = binning.bin_gaussians(
            mean2d, bbox_half, depth, valid, img_wh,
            tile_size=config.tile_size,
            max_pairs=config.max_pairs,
            max_per_tile=config.max_per_tile,
            build_table=not routed,
            attrs=packed,
            cull_alpha_min=config.cull_alpha_min,
        )
        idx = jax.lax.axis_index(axis_name)
        start = idx * shard
        tile_idx = start + jnp.arange(shard, dtype=jnp.int32)
        # padded tiles (id >= T) get fully-masked slots already (mask pad 0)
        if routed:
            from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
                rasterize_tile_block_pallas_routed,
            )

            local = rasterize_tile_block_pallas_routed(
                bins, mean2d, conic, color, opacity,
                jnp.minimum(tile_idx, T - 1), img_wh,
                tile_size=config.tile_size,
                pixel_offset=config.pixel_offset,
                depth_block=config.depth_block,
                t_eps=config.t_eps,
                max_per_tile=config.max_per_tile,
            )  # (shard, ts, ts, 3)
        elif config.use_pallas:
            from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
                rasterize_tile_block_pallas,
            )

            ids = jnp.pad(bins.ids, ((0, T_pad - T), (0, 0)))
            mask = jnp.pad(bins.mask, ((0, T_pad - T), (0, 0)))
            ids_s = jax.lax.dynamic_slice_in_dim(ids, start, shard, axis=0)
            mask_s = jax.lax.dynamic_slice_in_dim(mask, start, shard, axis=0)
            local = rasterize_tile_block_pallas(
                ids_s, mask_s, mean2d, conic, color, opacity,
                jnp.minimum(tile_idx, T - 1), img_wh,
                tile_size=config.tile_size,
                pixel_offset=config.pixel_offset,
                depth_block=config.depth_block,
                t_eps=config.t_eps,
            )  # (shard, ts, ts, 3)
        else:
            ids = jnp.pad(bins.ids, ((0, T_pad - T), (0, 0)))
            mask = jnp.pad(bins.mask, ((0, T_pad - T), (0, 0)))
            ids_s = jax.lax.dynamic_slice_in_dim(ids, start, shard, axis=0)
            mask_s = jax.lax.dynamic_slice_in_dim(mask, start, shard, axis=0)
            local = rasterize.rasterize_tile_block(
                ids_s, mask_s, mean2d, conic, color, opacity,
                jnp.minimum(tile_idx, T - 1), img_wh,
                tile_size=config.tile_size,
                tile_chunk=min(config.tile_chunk, shard),
                pixel_offset=config.pixel_offset,
            )  # (shard, ts, ts, 3)
        tiles = jax.lax.all_gather(
            local, axis_name, axis=0, tiled=True
        )  # (T_pad, ts, ts, 3)
        image = (
            tiles[:T]
            .reshape(nty, ntx, ts, ts, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(nty * ts, ntx * ts, 3)[:height, :width]
        )
        return image

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
        images = jax.lax.map(
            lambda a: per_camera(*a),
            (
                proj.mean2d, proj.conic, proj.depth, proj.color,
                proj.opacity, proj.bbox_half, proj.valid,
            ),
        )
        if with_visible:
            # same visibility stats as the single-chip path (render.RenderAux):
            # projection is replicated across chips, so these are exact on
            # every chip.
            vis_aux = (
                jnp.any(proj.valid, axis=0),
                jnp.sum(proj.valid, axis=0).astype(jnp.int32),
                jnp.max(jnp.max(proj.bbox_half, axis=1) * proj.valid, axis=0),
            )
            return images, vis_aux
        return images

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
        (loss, (l1, dssim, (visible, vis_count, radius))), (grads, grad2d) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, probe
            )
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
            # per-tile truncation/overflow is not surfaced by this path's
            # per_camera (image-only); the single-chip and DP paths track it
            truncated_accum=stats.truncated_accum,
            dropped_accum=stats.dropped_accum,
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
