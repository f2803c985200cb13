"""Primitives + tiles sharded training over a 2-D (data, gauss) mesh.

The most scalable layout (benchmark ladder item 5, BASELINE.md; the reference
is strictly single-GPU, SURVEY.md section 2b): Gaussian parameters AND their
optimizer state live sharded along the ``gauss`` mesh axis (a ZeRO-3-style
memory split — N scales with chips), while cameras shard along ``data``.

Per step, each chip:

1. projects ITS parameter shard for ITS camera shard (projection compute and
   parameter memory both scale 1/chips along their axes);
2. all-gathers the projected screen-space attributes over ``gauss`` (the
   compact (C, N) set — bytes, not parameters) so every chip can bin the
   full primitive set for its cameras;
3. rasterizes only its contiguous slice of the tile grid (the ``gauss`` axis
   doubles as the tile axis — raster compute scales 1/chips too) and
   all-gathers tile images into the frame for the photometric loss.

The backward pass needs no hand-written communication: JAX transposes the
tile all_gather into a scatter of per-tile cotangents back to their owner
chip, and the projected-attribute all_gather into a psum_scatter that sums
every chip's contribution into the parameter shard's gradient (the psum
rides ICI, overlapped with backward compute by XLA). Camera-shard gradients
are then pmean'd over ``data`` and Adam updates each shard locally.

Collectives per step and their axes:
  all_gather(proj, gauss)  fwd   |  psum_scatter(d proj, gauss)  bwd
  all_gather(tiles, gauss) fwd   |  scatter(d tiles, gauss)      bwd
  pmean(grads, data)       bwd   |  psum(stats/metrics, data)
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
from simplegaussiansplat_tk71_tpu.ops import binning, projection, rasterize
from simplegaussiansplat_tk71_tpu.ops.projection import ProjectedGaussians
from simplegaussiansplat_tk71_tpu.train.loss import photometric_loss


def make_gauss_sharded_train_step(
    mesh,
    config,
    render_cfg,
    img_wh,
    optimizer,
    params_template,
    data_axis: str = "data",
    gauss_axis: str = "gauss",
):
    """Build the jitted 2-D-sharded train step.

    Args:
      mesh: 2-D jax.sharding.Mesh with axes (data_axis, gauss_axis).
      params_template: global-shaped parameter pytree (shapes/dtypes only) —
        used to derive optimizer-state sharding specs.
    Signature (global arrays; jit shards them per the specs):
      (params, alive, opt_state, stats, Pm, Km, target)
        -> (params, opt_state, stats, metrics)
      with params/alive/opt_state/stats sharded over gauss (N divisible by
      the gauss axis), camera batch sharded over data (M divisible).
    """
    n_gauss = mesh.shape[gauss_axis]
    width, height = int(img_wh[0]), int(img_wh[1])
    ts = render_cfg.tile_size
    ntx, nty = -(-width // ts), -(-height // ts)
    T = ntx * nty
    T_pad = -(-T // n_gauss) * n_gauss
    shard_t = T_pad // n_gauss

    N_global = params_template["mean"].shape[-1]
    assert N_global % n_gauss == 0, (N_global, n_gauss)

    def gauss_spec(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[-1] == N_global:
            return P(*([None] * (x.ndim - 1)), gauss_axis)
        return P()

    params_spec = jax.tree.map(gauss_spec, params_template)
    opt_template = jax.eval_shape(optimizer.init, params_template)
    opt_spec = jax.tree.map(gauss_spec, opt_template)
    stats_spec = DensifyStats(
        grad_norm_accum=P(gauss_axis),
        visible_count=P(gauss_axis),
        grad2d_accum=P(gauss_axis),
        vis2d_count=P(gauss_axis),
        max_radius2d=P(gauss_axis),
        truncated_accum=P(),
        dropped_accum=P(),
    )
    width_f, height_f = float(img_wh[0]), float(img_wh[1])

    def per_camera(mean2d, conic, depth, color, opacity, bbox_half, valid):
        # the fast single-chip pipeline per tile-slice: routed pair-space
        # kernels + the alpha-floor cull, exactly like render.render_params
        routed = render_cfg.use_pallas and render_cfg.pair_grad_route
        # attrs required whenever the alpha cull is on (see render.py)
        packed = (
            jnp.concatenate([mean2d, conic, opacity[None], color], axis=0)
            if routed or render_cfg.cull_alpha_min > 0.0
            else None
        )
        bins = binning.bin_gaussians(
            mean2d, bbox_half, depth, valid, img_wh,
            tile_size=ts,
            max_pairs=render_cfg.max_pairs,
            max_per_tile=render_cfg.max_per_tile,
            build_table=not routed,
            attrs=packed,
            cull_alpha_min=render_cfg.cull_alpha_min,
        )
        idx = jax.lax.axis_index(gauss_axis)
        start = idx * shard_t
        tile_idx = jnp.minimum(start + jnp.arange(shard_t, dtype=jnp.int32), T - 1)
        if routed:
            from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
                rasterize_tile_block_pallas_routed,
            )

            local = rasterize_tile_block_pallas_routed(
                bins, mean2d, conic, color, opacity, tile_idx, img_wh,
                tile_size=ts, pixel_offset=render_cfg.pixel_offset,
                depth_block=render_cfg.depth_block, t_eps=render_cfg.t_eps,
                max_per_tile=render_cfg.max_per_tile,
            )
        else:
            ids = jnp.pad(bins.ids, ((0, T_pad - T), (0, 0)))
            mask = jnp.pad(bins.mask, ((0, T_pad - T), (0, 0)))
            ids_s = jax.lax.dynamic_slice_in_dim(ids, start, shard_t, axis=0)
            mask_s = jax.lax.dynamic_slice_in_dim(mask, start, shard_t, axis=0)
            if render_cfg.use_pallas:
                from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
                    rasterize_tile_block_pallas,
                )

                local = rasterize_tile_block_pallas(
                    ids_s, mask_s, mean2d, conic, color, opacity, tile_idx,
                    img_wh, tile_size=ts, pixel_offset=render_cfg.pixel_offset,
                    depth_block=render_cfg.depth_block, t_eps=render_cfg.t_eps,
                )
            else:
                local = rasterize.rasterize_tile_block(
                    ids_s, mask_s, mean2d, conic, color, opacity, tile_idx,
                    img_wh, tile_size=ts,
                    tile_chunk=min(render_cfg.tile_chunk, shard_t),
                    pixel_offset=render_cfg.pixel_offset,
                )  # (shard_t, ts, ts, 3)
        tiles = jax.lax.all_gather(
            local, gauss_axis, axis=0, tiled=True
        )  # (T_pad, ts, ts, 3); bwd: cotangent scatters back to owner chip
        image = (
            tiles[:T]
            .reshape(nty, ntx, ts, ts, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(nty * ts, ntx * ts, 3)[:height, :width]
        )
        return image, bins.dropped_pairs, bins.truncated

    def local_loss(params, probe, alive, Pm, Km, target):
        # project the LOCAL parameter shard for the LOCAL camera shard
        proj = projection.project(
            params["mean"], params["quat"], params["log_scale"],
            params["logit_opacity"], params["sh"], Pm, Km, img_wh,
            sh_degree=render_cfg.sh_degree,
            bbox_max_frac=render_cfg.bbox_max_frac,
            alive=alive, snap_mean_to_int=render_cfg.snap_mean_to_int,
        )
        # probe the LOCAL shard's screen-space means (pre-gather): its
        # gradient is this shard's dL/dmean2d (trainer.make_train_step)
        proj = proj._replace(mean2d=proj.mean2d + probe)
        # gather the projected attribute set over the gauss axis; JAX
        # transposes this to a psum_scatter of attribute cotangents in bwd
        proj_full = ProjectedGaussians(
            *(
                jax.lax.all_gather(f, gauss_axis, axis=f.ndim - 1, tiled=True)
                for f in proj
            )
        )
        images, dropped, truncated = jax.lax.map(
            lambda a: per_camera(*a),
            (
                proj_full.mean2d, proj_full.conic, proj_full.depth,
                proj_full.color, proj_full.opacity, proj_full.bbox_half,
                proj_full.valid,
            ),
        )
        loss, (l1, dssim) = photometric_loss(
            images, target, config.loss_lambda, config.ssim_window
        )
        aux = (
            l1, dssim, jnp.any(proj.valid, axis=0),
            jnp.sum(proj.valid, axis=0).astype(jnp.int32),
            jnp.max(jnp.max(proj.bbox_half, axis=1) * proj.valid, axis=0),
            jnp.sum(dropped), jnp.sum(truncated),
        )
        return loss, aux

    def step(params, alive, opt_state, stats, Pm, Km, target):
        B_local = Pm.shape[0]
        N_local = params["mean"].shape[-1]
        probe = jnp.zeros((B_local, 2, N_local), jnp.float32)
        (
            (loss, (l1, dssim, visible, vis_count, radius, dropped, truncated)),
            (grads, grad2d),
        ) = jax.value_and_grad(local_loss, argnums=(0, 1), has_aux=True)(
            params, probe, alive, Pm, Km, target
        )
        # Every gauss member computes the loss on the SAME assembled frame,
        # so the tile all_gather's transpose (a psum_scatter over gauss)
        # sums n_gauss identical copies of each tile's cotangent — divide
        # once to get the exact gradient (the probe rides the same gather).
        # Then camera-shard all-reduce over ICI (the gauss-axis spatial
        # reduction already happened inside the all_gather transposes).
        grads, grad2d = jax.tree.map(lambda g: g / n_gauss, (grads, grad2d))
        grads = jax.lax.pmean(grads, data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        l1 = jax.lax.pmean(l1, data_axis)
        dssim = jax.lax.pmean(dssim, data_axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        gnorm = jnp.linalg.norm(grads["mean"], axis=0)
        vis = jax.lax.psum(visible.astype(jnp.int32), data_axis)
        g2 = grad2d * jnp.asarray(
            [0.5 * width_f * B_local, 0.5 * height_f * B_local], jnp.float32
        ).reshape(1, 2, 1)
        g2n = jnp.sum(jnp.sqrt(jnp.sum(jnp.square(g2), axis=1)), axis=0)
        stats = DensifyStats(
            grad_norm_accum=stats.grad_norm_accum + gnorm,
            visible_count=stats.visible_count + (vis > 0).astype(jnp.int32),
            grad2d_accum=stats.grad2d_accum + jax.lax.psum(g2n, data_axis),
            vis2d_count=stats.vis2d_count + jax.lax.psum(vis_count, data_axis),
            max_radius2d=jnp.maximum(
                stats.max_radius2d, jax.lax.pmax(radius, data_axis)
            ),
            truncated_accum=stats.truncated_accum
            + jax.lax.psum(truncated, data_axis).astype(jnp.int32),
            dropped_accum=stats.dropped_accum
            + jax.lax.psum(dropped, data_axis).astype(jnp.int32),
        )
        metrics = {
            "loss": loss,
            "l1": l1,
            "dssim": dssim,
            "dropped_pairs": jax.lax.psum(dropped, data_axis),
            "truncated": jax.lax.psum(truncated, data_axis),
        }
        return params, opt_state, stats, metrics

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            params_spec,
            P(gauss_axis),  # alive
            opt_spec,
            stats_spec,
            P(data_axis),  # cameras
            P(data_axis),
            P(data_axis),  # target images
        ),
        out_specs=(params_spec, opt_spec, stats_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_2d_mesh(
    n_data: int, n_gauss: int, data_axis: str = "data",
    gauss_axis: str = "gauss",
):
    """2-D device mesh: data (cameras) x gauss (primitives + tiles)."""
    import numpy as np
    from jax.sharding import Mesh

    devices = jax.devices()
    need = n_data * n_gauss
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    return Mesh(
        np.asarray(devices[:need]).reshape(n_data, n_gauss),
        (data_axis, gauss_axis),
    )
