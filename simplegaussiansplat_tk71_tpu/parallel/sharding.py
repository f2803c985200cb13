"""Multi-chip training step: cameras sharded, parameters replicated.

Data-parallel layout over the ``data`` mesh axis (SURVEY.md section 2b):

- camera batch (P, K, target images) sharded along the data axis — each chip
  renders and differentiates its own cameras;
- Gaussian parameters + optimizer state replicated; per-chip parameter
  gradients are all-reduced with ``psum`` over ICI before the (replicated)
  Adam update, so every chip applies the identical update;
- densify statistics (grad norms, visibility) are likewise psum'd so the
  host-side densify sees global statistics.

The rasterization inside each chip is already tile-parallel (vectorized over
its cameras' tiles); a gauss-axis sharding for projection at very large N is
the next layer (see SURVEY.md section 7.2 item 5).

Built on shard_map so the collectives are explicit and XLA can overlap the
psum with backward compute.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
from simplegaussiansplat_tk71_tpu.render import render_params
from simplegaussiansplat_tk71_tpu.train.loss import photometric_loss


def make_sharded_train_step(
    mesh, config, render_cfg, img_wh, optimizer, axis_name: str = "data"
):
    """Returns a jitted step: (params, alive, opt_state, stats, Pm, Km, target)
    -> (params, opt_state, stats, metrics). Camera-batch inputs must have
    leading dim divisible by mesh.shape[axis_name]."""

    W, H = int(img_wh[0]), int(img_wh[1])

    def local_loss(params, probe, alive, Pm, Km, target):
        images, aux = render_params(
            params, alive, Pm, Km, img_wh, render_cfg, mean2d_probe=probe
        )
        loss, (l1, dssim) = photometric_loss(
            images, target, config.loss_lambda, config.ssim_window
        )
        return loss, (l1, dssim, aux)

    def step(params, alive, opt_state, stats, Pm, Km, target):
        B_local = Pm.shape[0]
        N = params["mean"].shape[-1]
        probe = jnp.zeros((B_local, 2, N), jnp.float32)
        (loss, (l1, dssim, aux)), (grads, grad2d) = jax.value_and_grad(
            local_loss, argnums=(0, 1), has_aux=True
        )(params, probe, alive, Pm, Km, target)
        # gradient all-reduce over ICI; mean to keep lrs batch-size invariant
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        l1 = jax.lax.pmean(l1, axis_name)
        dssim = jax.lax.pmean(dssim, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        gnorm = jnp.linalg.norm(grads["mean"], axis=0)
        visible = jax.lax.psum(aux.visible.astype(jnp.int32), axis_name)
        # screen-space stat (trainer.make_train_step semantics): the LOCAL
        # loss is a mean over B_local cameras, so scale the probe grad by
        # B_local to recover per-camera-loss gradients, then sum camera
        # contributions across the mesh
        g2 = grad2d * jnp.asarray(
            [0.5 * W * B_local, 0.5 * H * B_local], jnp.float32
        ).reshape(1, 2, 1)
        g2n = jnp.sum(jnp.sqrt(jnp.sum(jnp.square(g2), axis=1)), axis=0)
        stats = DensifyStats(
            grad_norm_accum=stats.grad_norm_accum + gnorm,
            visible_count=stats.visible_count + (visible > 0).astype(jnp.int32),
            grad2d_accum=stats.grad2d_accum + jax.lax.psum(g2n, axis_name),
            vis2d_count=stats.vis2d_count
            + jax.lax.psum(aux.visible_count, axis_name),
            max_radius2d=jnp.maximum(
                stats.max_radius2d, jax.lax.pmax(aux.max_radius2d, axis_name)
            ),
            truncated_accum=stats.truncated_accum
            + jax.lax.psum(jnp.sum(aux.truncated), axis_name).astype(jnp.int32),
            dropped_accum=stats.dropped_accum
            + jax.lax.psum(jnp.sum(aux.dropped_pairs), axis_name).astype(
                jnp.int32
            ),
        )
        metrics = {
            "loss": loss,
            "l1": l1,
            "dssim": dssim,
            "dropped_pairs": jax.lax.psum(jnp.sum(aux.dropped_pairs), axis_name),
            "truncated": jax.lax.psum(jnp.sum(aux.truncated), axis_name),
        }
        return params, opt_state, stats, metrics

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P(),  # params replicated
            P(),  # alive replicated
            P(),  # opt_state replicated
            P(),  # stats replicated
            P(axis_name),  # cameras sharded
            P(axis_name),
            P(axis_name),  # target images sharded
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
