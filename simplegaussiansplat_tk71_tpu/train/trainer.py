"""Training loop: jitted step + host-side densify scheduling.

The reference's Control.learning (gs_control.py:98-244) redone for XLA: one
jit-compiled train step (render -> loss -> analytic+auto VJP -> Adam update ->
stats accumulation) over static capacity shapes, with densify/prune/opacity
resets applied on host at their scheduled intervals (shapes only change there,
and only in capacity buckets).

Differences from the reference, by design:
- Adam state persists across steps (the reference rebuilds Adam every
  iteration, gs_control.py:197-199 + gs_model.py:43-47, silently resetting
  moments; set TrainConfig.reset_adam_every_step=True for that behavior).
- After densify/prune the optimizer state is re-initialized (the reference
  also rebuilds Adam there, gs_model.py:263).
- No recursive retry-on-exception (gs_control.py:241-244); failures raise.
"""

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplegaussiansplat_tk71_tpu.adaptive.densify import (
    DensifyStats,
    densify_and_prune,
    reset_opacity,
)
from simplegaussiansplat_tk71_tpu.models.gaussians import GaussianModel
from simplegaussiansplat_tk71_tpu.render import RenderConfig, render_params
from simplegaussiansplat_tk71_tpu.train.config import TrainConfig
from simplegaussiansplat_tk71_tpu.train.loss import photometric_loss
from simplegaussiansplat_tk71_tpu.train.hyper import HyperState
from simplegaussiansplat_tk71_tpu.train.optim import make_optimizer


def make_train_step(config: TrainConfig, render_cfg: RenderConfig, img_wh, optimizer):
    """Build the jitted train step over static shapes.

    Signature: (params, alive, opt_state, stats, P, K, target, mask)
      -> (params, opt_state, stats, metrics dict)

    mask: per-camera pixel validity (B, H, W) for mixed-size scenes (pad-to-
    max; see data/dataset.py), or None for the exact uniform-size path.
    """

    def loss_fn(params, alive, P, K, target, mask):
        images, aux = render_params(params, alive, P, K, img_wh, render_cfg)
        loss, (l1, dssim) = photometric_loss(
            images, target, config.loss_lambda, config.ssim_window, mask=mask
        )
        if mask is None:
            mse = jnp.mean(jnp.square(images - target))
        else:
            m = mask.astype(images.dtype)[..., None]
            mse = jnp.sum(jnp.square((images - target) * m)) / jnp.maximum(
                jnp.sum(m) * images.shape[-1], 1.0
            )
        return loss, (l1, dssim, mse, aux)

    # donate params/opt_state/stats: callers thread them through step-to-step
    # (saves ~0.4 GB HBM at the 1M-gaussian bench scale; the full step peaks
    # near the 16 GB v5e capacity). SGS_DONATE=0 disables it for layout A/Bs.
    _donate = (0, 2, 3) if os.environ.get("SGS_DONATE", "1") == "1" else ()

    @functools.partial(jax.jit, donate_argnums=_donate)
    def train_step(params, alive, opt_state, stats, P, K, target, mask=None):
        (loss, (l1, dssim, mse, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, alive, P, K, target, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        # densify stats: accumulated ||dL/dmean|| + visibility counter
        # (param_iter_update, gs_model.py:190-194)
        gnorm = jnp.linalg.norm(grads["mean"], axis=0)
        stats = DensifyStats(
            grad_norm_accum=stats.grad_norm_accum + gnorm,
            visible_count=stats.visible_count + aux.visible.astype(jnp.int32),
        )
        # NaN sweep the reference keeps commented (check_nan,
        # gs_model.py:822-829) — here a single cheap reduced flag per step
        grads_finite = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        )
        metrics = {
            "loss": loss,
            "l1": l1,
            "dssim": dssim,
            "psnr": 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)),
            "grads_finite": grads_finite,
            "dropped_pairs": jnp.sum(aux.dropped_pairs),
            "truncated": jnp.sum(aux.truncated),
        }
        return params, opt_state, stats, metrics

    return train_step


class Trainer:
    """Drives training of one scene. See cli.py for end-to-end usage."""

    def __init__(
        self,
        model: GaussianModel,
        dataset,
        config: TrainConfig = TrainConfig(),
        render_cfg: Optional[RenderConfig] = None,
        log_fn=print,
    ):
        self.config = config
        self.dataset = dataset
        use_pallas = config.use_pallas
        if use_pallas is None:  # auto: fused kernels anywhere but CPU
            use_pallas = jax.default_backend() != "cpu"
        self.render_cfg = render_cfg or RenderConfig(
            tile_size=config.tile_size,
            max_per_tile=config.max_per_tile,
            max_pairs=config.max_pairs,
            tile_chunk=config.tile_chunk,
            sh_degree=config.sh_degree,
            bbox_max_frac=config.bbox_max_frac,
            use_pallas=use_pallas,
            depth_block=config.depth_block,
            t_eps=config.t_eps,
            cull_alpha_min=config.cull_alpha_min,
            pair_grad_route=config.pair_grad_route,
        )
        self.model = model
        # C7: densify/prune thresholds ride in a dedicated hyperparameter
        # container (frozen by default, like the reference's
        # _GS_model_with_ultra_param — gs_model.py:76-89); densify events
        # below read through it so a meta-updated value takes effect live.
        self.hyper = HyperState.from_config(config)
        self.optimizer = make_optimizer(config)
        self.opt_state = self.optimizer.init(model.trainable())
        self.stats = DensifyStats.zeros(model.capacity)
        self.step = 0
        # cached host-side alive count: it only changes at densify events,
        # and num_alive() per step would cost a device reduction + fetch
        # (~26 ms RPC over the tunneled TPU)
        self.n_alive = int(model.num_alive())
        self.extent = dataset.extent if dataset is not None else 1.0
        self.log = log_fn
        self._rng = np.random.default_rng(config.seed)
        self._train_step = make_train_step(
            config, self.render_cfg, dataset.img_wh, self.optimizer
        )

    def restore(self, path: str) -> int:
        """Resume from a checkpoint written by train(); returns the step.

        One read of the .npz rebuilds model (incl. capacity), densify stats,
        and the optimizer state. The optimizer state is reinitialized ONLY
        when the checkpoint structurally cannot carry it (missing keys or
        shape drift from a changed optimizer config), and the exact mismatch
        is logged — a corrupt value (e.g. a truncated array) raises instead
        of silently degrading to fresh Adam moments.
        """
        import jax.numpy as jnp

        from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
        from simplegaussiansplat_tk71_tpu.models.gaussians import GaussianModel

        data = np.load(path)
        self.model = GaussianModel(
            mean=jnp.asarray(data["model.mean"]),
            quat=jnp.asarray(data["model.quat"]),
            log_scale=jnp.asarray(data["model.log_scale"]),
            logit_opacity=jnp.asarray(data["model.logit_opacity"]),
            sh=jnp.asarray(data["model.sh"]),
            alive=jnp.asarray(data["model.alive"]),
        )
        self.stats = DensifyStats(
            grad_norm_accum=jnp.asarray(data["stats.grad_norm_accum"]),
            visible_count=jnp.asarray(data["stats.visible_count"]),
        )
        self._reinit_opt()
        leaves, treedef = jax.tree_util.tree_flatten_with_path(self.opt_state)
        mismatch = []
        new_leaves = []
        for pathkey, like in leaves:
            key = "opt" + "".join(str(p) for p in pathkey)
            if key not in data:
                mismatch.append(f"missing {key}")
            elif data[key].shape != np.shape(like):
                mismatch.append(
                    f"{key}: {data[key].shape} != {np.shape(like)}"
                )
            else:
                new_leaves.append(jnp.asarray(data[key]))
        if mismatch:
            self.log(
                "[restore] optimizer state reinitialized — checkpoint "
                f"mismatch: {'; '.join(mismatch[:4])}"
            )
        else:
            self.opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        self.step = int(data["step"])
        self.n_alive = int(self.model.num_alive())
        return self.step

    def _reinit_opt(self):
        # fresh Adam over the (possibly re-packed) tensors — the reference
        # also rebuilds Adam at densify (gs_model.py:263). The jitted step
        # function is NOT rebuilt: its closure (config/render_cfg/img_wh/
        # optimizer) is unchanged, and jax.jit retraces per capacity shape on
        # its own — rebuilding would discard the trace cache and force a full
        # recompile (60-170 s remotely) at every densify event.
        self.opt_state = self.optimizer.init(self.model.trainable())

    def run_step(self, P, K, target, mask=None):
        """One optimization step on a batch of cameras.

        mask: (B, H, W) pixel validity for mixed-size scenes (None = all
        cameras share img_wh)."""
        params = self.model.trainable()
        if self.config.reset_adam_every_step:
            self.opt_state = self.optimizer.init(params)
        params, self.opt_state, self.stats, metrics = self._train_step(
            params, self.model.alive, self.opt_state, self.stats,
            jnp.asarray(P), jnp.asarray(K), jnp.asarray(target),
            None if mask is None else jnp.asarray(mask),
        )
        self.model = self.model.with_trainable(params)
        self.step += 1

        cfg = self.config
        if (
            cfg.densify_from_iter <= self.step <= cfg.densify_until_iter
            and self.step % cfg.densification_interval == 0
        ):
            self.model, self.stats, info = densify_and_prune(
                self.model,
                self.stats,
                self.extent,
                grad_threshold=self.hyper.value("grad_threshold"),
                percent_dense=self.hyper.value("percent_dense"),
                prune_min_opacity=self.hyper.value("prunning_min_opacity"),
                split_n=cfg.split_n,
                rng=self._rng,
                reset_stats=cfg.reset_stats_after_densify,
                capacity_growth=cfg.capacity_growth,
            )
            if cfg.morton_reorder:
                # spatial row order (adaptive/reorder.py); safe here because
                # the optimizer is rebuilt below anyway
                from simplegaussiansplat_tk71_tpu.adaptive.reorder import (
                    morton_reorder,
                )

                self.model, self.stats = morton_reorder(self.model, self.stats)
            self._reinit_opt()
            self.n_alive = int(info["alive"])
            self.log(
                f"[densify @ {self.step}] split={info['split']} "
                f"clone={info['clone']} prune={info['prune']} alive={info['alive']}"
            )
            if info["alive"] == 0 or info["prune"] > 2 * max(info["alive"], 1):
                self.log(
                    "WARNING: densify pruned most/all gaussians — scene "
                    f"extent ({self.extent:.3g}) is likely too small relative "
                    "to the gaussian scales (prune rule: max scale > 0.1 * "
                    "extent). Check camera poses / knn init."
                )
        if (
            cfg.opacity_reset_interval
            and self.step % cfg.opacity_reset_interval == 0
        ):
            self.model = reset_opacity(self.model, cfg.reset_opacity_min)
            self._reinit_opt()
            self.log(f"[opacity reset @ {self.step}]")
        return metrics

    def train(
        self,
        num_steps: Optional[int] = None,
        checkpoint_dir: Optional[str] = None,
        metrics_path: Optional[str] = None,
        render_dir: Optional[str] = None,
        render_every: int = 500,
    ):
        """Run the full schedule over shuffled camera batches.

        metrics_path: JSONL per-step metrics stream (loss, PSNR, alive, ...).
        render_dir/render_every: periodic eval PNG of camera 0 (the
        reference's per-iteration dump, gs_control.py:217-223, throttled).
        """
        from simplegaussiansplat_tk71_tpu.render import render
        from simplegaussiansplat_tk71_tpu.train.checkpoint import save_checkpoint
        from simplegaussiansplat_tk71_tpu.utils.logging import MetricsLogger, save_png

        num_steps = num_steps or self.config.iterations
        logger = MetricsLogger(metrics_path)
        t_start = time.time()
        loss_sum = 0.0
        for P, K, images, idx in self.dataset.batches(
            self.config.batch_size, seed=self.config.seed
        ):
            t0 = time.time()
            metrics = self.run_step(
                P, K, images, mask=self.dataset.pixel_mask(idx)
            )
            # one bulk transfer (device_get starts every copy async, then
            # blocks once) instead of a per-key fetch — each scalar fetch is
            # a full RPC round-trip on a tunneled TPU
            metrics = jax.device_get(metrics)
            loss = float(metrics["loss"])
            loss_sum += loss
            dt = time.time() - t0
            logger.log(
                self.step,
                loss=loss,
                l1=metrics["l1"],
                dssim=metrics["dssim"],
                psnr=metrics["psnr"],
                grads_finite=metrics["grads_finite"],
                truncated=metrics["truncated"],
                dropped_pairs=metrics["dropped_pairs"],
                alive=self.n_alive,
                sec_per_it=round(dt, 4),
            )
            if self.step % 10 == 0 or self.step <= 3:
                self.log(
                    f"step {self.step}: loss={loss:.5f} "
                    f"avg={loss_sum / self.step:.5f} "
                    f"psnr={float(metrics['psnr']):.2f} {dt:.3f}s/it "
                    f"alive={self.n_alive} "
                    f"trunc={int(metrics['truncated'])}"
                )
            if not bool(metrics["grads_finite"]):
                self.log(f"WARNING: non-finite gradients at step {self.step}")
            if render_dir and self.step % render_every == 0:
                img, _ = render(
                    self.model,
                    jnp.asarray(self.dataset.scene.P[:1]),
                    jnp.asarray(self.dataset.scene.K[:1]),
                    self.dataset.img_wh,
                    self.render_cfg,
                )
                save_png(f"{render_dir}/step_{self.step:06d}.png", img[0])
            if checkpoint_dir and self.step % self.config.checkpoint_every == 0:
                save_checkpoint(
                    f"{checkpoint_dir}/ckpt_{self.step}.npz",
                    self.model, self.opt_state, self.stats, self.step,
                )
            if self.step >= num_steps:
                break
        logger.close()
        self.log(
            f"done: {self.step} steps in {(time.time() - t_start) / 60:.1f} min"
        )
        return self.model
