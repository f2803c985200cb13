"""End-to-end differentiable renderer: project -> bin -> composite.

One jit-traceable function replacing the reference's forward
(gs_model.py:277-460): no per-image python loop, no CPU eigh, no dynamic
fragment lists. Cameras are vmapped; tiles stream through lax.map chunks.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from simplegaussiansplat_tk71_tpu.models.gaussians import GaussianModel
from simplegaussiansplat_tk71_tpu.ops import binning, projection, rasterize


class RenderConfig(NamedTuple):
    tile_size: int = 16
    max_per_tile: int = 512
    max_pairs: int | None = None  # default 8 * capacity
    tile_chunk: int = 64
    sh_degree: int = 2
    pixel_offset: float = 0.5
    bbox_max_frac: float = 0.4  # reference 0.4*sqrt(WH) box cap
    use_pallas: bool = False  # fused TPU kernels (ops/rasterize_pallas)
    depth_block: int | None = None  # pallas: blocked kernel w/ early-out
    t_eps: float = 1e-4  # pallas blocked kernel early-out threshold
    cull_alpha_min: float = 0.0  # exact per-pair tile-intersection culling
    # at this alpha floor (official-3DGS uses 1/255); 0 = exact 3-sigma-box
    # semantics like the reference. Routed-pallas path only (needs the
    # sort-carried attrs).
    pair_grad_route: bool = True  # pair-space grad routing (pallas path):
    # compositor reads tile-sorted pair space directly (no id-table /
    # slot-space gathers) and per-gaussian gradient reduction is a gather +
    # MXU segment sum in gaussian-major pair order instead of a 9-column
    # scatter-add transpose (ops/binning module docstring)
    snap_mean_to_int: bool = False  # reference parity (gs_model.py:361)
    grad_color_wl: bool = False  # reference parity (gs_model.py:762-766):
    # color gradient as the channel-summed pixel grad divided by the color
    # (grad_l = w / l) instead of the spec-correct per-channel formula.
    # XLA path only (use_pallas must be False).


class RenderAux(NamedTuple):
    visible: jnp.ndarray  # (N,) bool — gaussian visible in >=1 camera
    num_pairs: jnp.ndarray  # (M,) int32
    dropped_pairs: jnp.ndarray  # (M,) int32
    truncated: jnp.ndarray  # (M,) int32
    visible_count: jnp.ndarray = None  # (N,) int32 — per-camera visibility
    max_radius2d: jnp.ndarray = None  # (N,) f32 — max screen radius, pixels


def render(
    model: GaussianModel,
    P: jnp.ndarray,
    K: jnp.ndarray,
    img_wh,
    config: RenderConfig = RenderConfig(),
):
    """Render M cameras. Returns ((M, H, W, 3) images, RenderAux)."""
    return render_params(
        model.trainable(), model.alive, P, K, img_wh, config
    )


def render_params(
    params: dict,
    alive: jnp.ndarray,
    P: jnp.ndarray,
    K: jnp.ndarray,
    img_wh,
    config: RenderConfig = RenderConfig(),
    mean2d_probe: jnp.ndarray | None = None,
):
    """Render from a raw trainable-parameter dict (grad-friendly entry).

    mean2d_probe: optional (M, 2, N) zeros added to the projected pixel-space
    means. Differentiating w.r.t. it exposes the per-camera screen-space mean
    gradient dL/dmean2d without changing the forward value — the official-3DGS
    densification statistic (see adaptive/densify.DensifyStats.grad2d_accum).
    """
    if config.grad_color_wl and config.use_pallas:
        raise ValueError("grad_color_wl is a parity switch of the XLA path")
    proj = projection.project(
        params["mean"],
        params["quat"],
        params["log_scale"],
        params["logit_opacity"],
        params["sh"],
        P,
        K,
        img_wh,
        sh_degree=config.sh_degree,
        bbox_max_frac=config.bbox_max_frac,
        alive=alive,
        snap_mean_to_int=config.snap_mean_to_int,
    )
    if mean2d_probe is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_probe)

    def per_camera(mean2d, conic, depth, color, opacity, bbox_half, valid):
        routed = config.use_pallas and config.pair_grad_route
        # the alpha cull needs the attr columns even on the id-table (XLA)
        # path — without them binning would silently skip the cull and the
        # two paths would composite DIFFERENT pair sets (caught by
        # device_check's cull configs on v5e)
        packed = (
            jnp.concatenate([mean2d, conic, opacity[None], color], axis=0)
            if routed or config.cull_alpha_min > 0.0
            else None
        )  # (9, N): the render attrs ride the binning sort (see ops/binning)
        bins = binning.bin_gaussians(
            mean2d,
            bbox_half,
            depth,
            valid,
            img_wh,
            tile_size=config.tile_size,
            max_pairs=config.max_pairs,
            max_per_tile=config.max_per_tile,
            # the routed pallas path reads pair space directly — skip the
            # (T, K) id-table gather entirely (18 ms at bench scale)
            build_table=not routed,
            attrs=packed,
            # path-agnostic: the cull drops pairs before the sort, so the
            # id-table (XLA / slot-space) and routed pair-space paths see
            # identical surviving pairs — which also keeps device_check's
            # XLA-vs-pallas comparison exact under the bench's 1/255 cull
            cull_alpha_min=config.cull_alpha_min,
        )
        if config.use_pallas:
            from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
                rasterize_tiles_pallas,
            )

            image = rasterize_tiles_pallas(
                bins.ids,
                bins.mask,
                mean2d,
                conic,
                color,
                opacity,
                img_wh,
                tile_size=config.tile_size,
                pixel_offset=config.pixel_offset,
                depth_block=config.depth_block,
                t_eps=config.t_eps,
                route=bins if config.pair_grad_route else None,
                max_per_tile=config.max_per_tile,
            )
        else:
            image = rasterize.rasterize_tiles(
                bins.ids,
                bins.mask,
                mean2d,
                conic,
                color,
                opacity,
                img_wh,
                tile_size=config.tile_size,
                tile_chunk=config.tile_chunk,
                pixel_offset=config.pixel_offset,
                grad_color_wl=config.grad_color_wl,
            )
        return image, bins.num_pairs, bins.dropped_pairs, bins.truncated

    # lax.map (scan), not vmap: cameras composite sequentially, so the
    # P-sized binning buffers exist once rather than per camera, and the
    # pallas kernels (incl. the manual-DMA segment sum in the routed
    # backward) trace normally instead of under a batching transform. The
    # TPU executes one camera's ops serially either way.
    images, num_pairs, dropped, truncated = jax.lax.map(
        lambda a: per_camera(*a),
        (
            proj.mean2d,
            proj.conic,
            proj.depth,
            proj.color,
            proj.opacity,
            proj.bbox_half,
            proj.valid,
        ),
    )
    aux = RenderAux(
        visible=jnp.any(proj.valid, axis=0),
        num_pairs=num_pairs,
        dropped_pairs=dropped,
        truncated=truncated,
        visible_count=jnp.sum(proj.valid, axis=0).astype(jnp.int32),
        # screen radius = max bbox half-extent (3-sigma, pixels) over cameras;
        # feeds the official-3DGS big-point screen prune (adaptive/densify)
        max_radius2d=jnp.max(
            jnp.max(proj.bbox_half, axis=1) * proj.valid, axis=0
        ),
    )
    return images, aux
