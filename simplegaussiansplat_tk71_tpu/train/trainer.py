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
- At densify/prune events, surviving rows KEEP their Adam moments (official
  3DGS cat_tensors_to_optimizer; TrainConfig.preserve_adam_on_densify=False
  reverts to the reference's full rebuild, gs_model.py:263). Either way the
  position-lr schedule stays on the GLOBAL step — the reference drives lr
  explicitly from the iteration counter (gs_model.py:160-165), so resetting
  the optax schedule count at densify events (as round 1/2 did) silently
  froze the position lr at lr_init.
- The densification statistic defaults to the official-3DGS screen-space
  2-D mean gradient with per-event stat reset and growth caps (see
  adaptive/densify docstring; TrainConfig.densify_stat="grad3d" +
  reset_stats_after_densify=False restores reference behavior).
- No recursive retry-on-exception (gs_control.py:241-244); failures raise.
"""

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

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


def set_schedule_counts(opt_state, step):
    """Pin every lr-schedule counter in an optax state to ``step``.

    The position lr rides an optax schedule whose count lives in the
    optimizer state; any optimizer re-init would restart it at 0. The
    reference computes lr directly from the global iteration
    (gs_model.py:160-165 + uitility.py:573-606), so the schedule must track
    the global step across re-inits."""

    def fix(s):
        if isinstance(s, optax.ScaleByScheduleState):
            return s._replace(count=jnp.asarray(step, s.count.dtype))
        return s

    return jax.tree.map(
        fix,
        opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState),
    )


def remap_opt_state(optimizer, old_state, new_params, adam_src, cap_old):
    """Carry Adam moments across a densify repack.

    adam_src: (C_new,) int32 — old capacity row whose moments each new row
    keeps, or -1 for fresh rows (children/clones start with zero moments, as
    in official 3DGS's cat_tensors_to_optimizer). Step counters (Adam bias
    correction + lr schedules) are carried from the old state."""
    new_like = optimizer.init(new_params)
    src = jnp.asarray(np.asarray(adam_src))
    idx = jnp.maximum(src, 0)
    keep = src >= 0
    cap_new = int(src.shape[0])

    def merge(new, old):
        old_shape = getattr(old, "shape", None)
        new_shape = getattr(new, "shape", None)
        if (
            old_shape is not None
            and len(old_shape) >= 1
            and old_shape[-1] == cap_old
            and new_shape is not None
            and len(new_shape) == len(old_shape)
            and new_shape[-1] == cap_new
            and new_shape[:-1] == old_shape[:-1]
        ):
            g = jnp.take(old, idx, axis=-1)
            return jnp.where(keep, g, jnp.zeros_like(g))
        if new_shape == old_shape:
            return old  # step counters
        return new  # structurally new leaf: keep fresh init

    return jax.tree.map(merge, new_like, old_state)


def zero_group_adam_moments(opt_state, label: str):
    """Zero one multi_transform group's Adam moments (official 3DGS zeroes
    the opacity moments at reset_opacity, replace_tensor_to_optimizer)."""

    def zero_adam(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(
                mu=jax.tree.map(jnp.zeros_like, s.mu),
                nu=jax.tree.map(jnp.zeros_like, s.nu),
            )
        return s

    inner = dict(opt_state.inner_states)
    inner[label] = jax.tree.map(
        zero_adam,
        inner[label],
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
    )
    return opt_state._replace(inner_states=inner)


def make_train_step(config: TrainConfig, render_cfg: RenderConfig, img_wh, optimizer):
    """Build the jitted train step over static shapes.

    Signature: (params, alive, opt_state, stats, P, K, target, mask)
      -> (params, opt_state, stats, metrics dict)

    mask: per-camera pixel validity (B, H, W) for mixed-size scenes (pad-to-
    max; see data/dataset.py), or None for the exact uniform-size path.
    """
    W, H = int(img_wh[0]), int(img_wh[1])

    def loss_fn(params, probe, alive, P, K, target, mask):
        images, aux = render_params(
            params, alive, P, K, img_wh, render_cfg, mean2d_probe=probe
        )
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

    def _step(params, alive, opt_state, stats, P, K, target, mask=None):
        B = target.shape[0]
        N = params["mean"].shape[-1]
        # zero probe: its gradient is the per-camera screen-space mean
        # gradient dL/dmean2d (see render.render_params docstring)
        probe = jnp.zeros((B, 2, N), jnp.float32)
        (loss, (l1, dssim, mse, aux)), (grads, grad2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, probe, alive, P, K, target, mask)
        if config.debug_nan_checks:
            # the reference's check_nan(x, name) sweep (gs_model.py:822-829,
            # call sites commented out there) — named checkify checks that
            # raise on the host with the failing tensor's name
            from jax.experimental import checkify

            checkify.check(jnp.isfinite(loss), "non-finite loss")
            for name, g in grads.items():
                checkify.check(
                    jnp.all(jnp.isfinite(g)), "non-finite grad: " + name
                )
        # one bad step must not poison the run: the r3b quality run hit a
        # transient non-finite batch at step 10826 (see NOTES.md round-3),
        # the update was applied anyway, and Adam moments + params were NaN
        # for the remaining 19k steps. Skip the whole update (params, opt
        # state, densify-stat accumulation) when the loss or any gradient is
        # non-finite; the step is still counted and flagged in metrics.
        ok = jnp.isfinite(loss) & jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        )
        updates, opt_state_new = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: jnp.where(ok, p + u, p), params, updates
        )
        opt_state = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), opt_state_new, opt_state
        )
        # densify stats (adaptive/densify.DensifyStats):
        # - reference 3-D stat: accumulated ||dL/dmean|| + any-camera
        #   visibility (param_iter_update, gs_model.py:190-194)
        # - official 2-D stat: per-camera ||dL/dmean2d|| in half-image units.
        #   The loss is a mean over the B-camera batch, so the probe grad is
        #   (1/B) x the per-camera-loss gradient; scale by B to recover the
        #   official per-render-call accumulation semantics.
        gnorm = jnp.linalg.norm(grads["mean"], axis=0)
        g2 = grad2d * jnp.asarray(
            [0.5 * W * B, 0.5 * H * B], jnp.float32
        ).reshape(1, 2, 1)
        g2n = jnp.sqrt(jnp.sum(jnp.square(g2), axis=1))  # (B, N)
        # a skipped (non-finite) step contributes nothing to the densify
        # statistics either — its forward/backward outputs are garbage
        stats = DensifyStats(
            grad_norm_accum=stats.grad_norm_accum + jnp.where(ok, gnorm, 0.0),
            visible_count=stats.visible_count
            + jnp.where(ok, aux.visible.astype(jnp.int32), 0),
            grad2d_accum=stats.grad2d_accum
            + jnp.where(ok, jnp.sum(g2n, axis=0), 0.0),
            vis2d_count=stats.vis2d_count + jnp.where(ok, aux.visible_count, 0),
            max_radius2d=jnp.where(
                ok,
                jnp.maximum(stats.max_radius2d, aux.max_radius2d),
                stats.max_radius2d,
            ),
            truncated_accum=stats.truncated_accum
            + jnp.where(ok, jnp.sum(aux.truncated).astype(jnp.int32), 0),
            dropped_accum=stats.dropped_accum
            + jnp.where(ok, jnp.sum(aux.dropped_pairs).astype(jnp.int32), 0),
        )
        # NaN sweep the reference keeps commented (check_nan,
        # gs_model.py:822-829) — here a single cheap reduced flag per step
        grads_finite = ok
        psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
        truncated = jnp.sum(aux.truncated)
        metrics = {
            "loss": loss,
            "l1": l1,
            "dssim": dssim,
            "psnr": psnr,
            "grads_finite": grads_finite,
            "dropped_pairs": jnp.sum(aux.dropped_pairs),
            "truncated": truncated,
        }
        # one fetchable array per step for metric-buffering drivers: over the
        # tunneled TPU every separate device buffer costs a full RPC round
        # trip at fetch time (~26 ms), so fetching the 7 scalars above per
        # step dominated the r5 quality-run tail (benchmarks/quality_run.py)
        metrics["packed"] = jnp.stack([
            loss, psnr, l1, dssim, truncated.astype(jnp.float32),
            grads_finite.astype(jnp.float32),
        ])
        return params, opt_state, stats, metrics

    if config.debug_nan_checks:
        # NaN/Inf sanitizer behind a debug flag (SURVEY section 5). Named
        # checkify checks at the loss/gradient boundary (see _step) raise on
        # the host with the failing tensor's name. Debug tool: no donation,
        # never the default path. (Whole-graph checkify.float_checks was
        # rejected: instrumenting every op made compiles minutes-long.)
        from jax.experimental import checkify

        checked = jax.jit(
            checkify.checkify(_step, errors=checkify.user_checks)
        )

        def train_step(*args, **kw):
            err, out = checked(*args, **kw)
            checkify.check_error(err)  # raises on the host if any check tripped
            return out

        return train_step

    return functools.partial(jax.jit, donate_argnums=_donate)(_step)


class Trainer:
    """Drives training of one scene. See cli.py for end-to-end usage.

    Densify thresholds are read through ``self.hyper`` (a HyperState built
    from the config at construction); external mutation of ``trainer.config``
    after construction does not affect them — use ``trainer.hyper`` setters
    for live schedules.
    """

    def __init__(
        self,
        model: GaussianModel,
        dataset,
        config: TrainConfig = TrainConfig(),
        render_cfg: Optional[RenderConfig] = None,
        log_fn=print,
        densify_cb=None,
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
        self.densify_cb = densify_cb  # called with the event info dict
        self.densify_events = []  # instrumentation (VERDICT round-2 next #1)
        # host mirrors of the overflow accumulators for the post-densify
        # polling path (_post_densify_overflow_check); reset whenever the
        # device accumulators are (densify events repack stats with zeroed
        # scalar accumulators in both reset_stats branches)
        self._trunc_seen = 0
        self._dropped_seen = 0
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
        of silently degrading to fresh Adam moments. Checkpoints from before
        the round-3 stats extension restore with the new stat fields zeroed.
        """
        data = np.load(path)
        self.model = GaussianModel(
            mean=jnp.asarray(data["model.mean"]),
            quat=jnp.asarray(data["model.quat"]),
            log_scale=jnp.asarray(data["model.log_scale"]),
            logit_opacity=jnp.asarray(data["model.logit_opacity"]),
            sh=jnp.asarray(data["model.sh"]),
            alive=jnp.asarray(data["model.alive"]),
        )
        cap = self.model.capacity
        zeroed = DensifyStats.zeros(cap)

        def stat(name, like):
            key = f"stats.{name}"
            return jnp.asarray(data[key]) if key in data else like

        self.stats = DensifyStats(
            grad_norm_accum=stat("grad_norm_accum", zeroed.grad_norm_accum),
            visible_count=stat("visible_count", zeroed.visible_count),
            grad2d_accum=stat("grad2d_accum", zeroed.grad2d_accum),
            vis2d_count=stat("vis2d_count", zeroed.vis2d_count),
            max_radius2d=stat("max_radius2d", zeroed.max_radius2d),
            truncated_accum=stat("truncated_accum", zeroed.truncated_accum),
            dropped_accum=stat("dropped_accum", zeroed.dropped_accum),
        )
        self.step = int(data["step"])
        # re-apply adapted run state (e.g. a max_per_tile raised by the
        # truncation adaptation) before the step function is rebuilt
        adapted = {}
        if "extra.max_per_tile" in data:
            # clamp to the CURRENT config's ceiling: restoring lets a run be
            # resumed with a lower limit (e.g. the post-densify tail after
            # the population froze — slot-table costs scale with K, and the
            # adaptation re-raises K only up to the limit if truncation
            # actually reappears)
            k = min(
                int(data["extra.max_per_tile"]), self.config.max_per_tile_limit
            )
            if k != self.render_cfg.max_per_tile:
                adapted["max_per_tile"] = k
        if "extra.max_pairs" in data:
            p = int(data["extra.max_pairs"])
            if p != self.render_cfg.max_pairs:
                adapted["max_pairs"] = p
        if adapted:
            self.log(f"[restore] adapted run state from checkpoint: {adapted}")
            self.render_cfg = self.render_cfg._replace(**adapted)
            self._train_step = make_train_step(
                self.config, self.render_cfg, self.dataset.img_wh,
                self.optimizer,
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
        self.n_alive = int(self.model.num_alive())
        return self.step

    def checkpoint_extra(self) -> dict:
        """Run state for save_checkpoint's ``extra`` (restore re-applies)."""
        extra = {"max_per_tile": self.render_cfg.max_per_tile}
        if self.render_cfg.max_pairs is not None:
            extra["max_pairs"] = self.render_cfg.max_pairs
        return extra

    def _reinit_opt(self):
        # fresh Adam over the (possibly re-packed) tensors — the reference
        # also rebuilds Adam at densify (gs_model.py:263). The jitted step
        # function is NOT rebuilt: its closure (config/render_cfg/img_wh/
        # optimizer) is unchanged, and jax.jit retraces per capacity shape on
        # its own — rebuilding would discard the trace cache and force a full
        # recompile (60-170 s remotely) at every densify event.
        self.opt_state = self.optimizer.init(self.model.trainable())
        # lr schedules always track the global step (module docstring)
        self.opt_state = set_schedule_counts(self.opt_state, self.step)

    def _maybe_adapt_max_per_tile(self, trunc_accum: int):
        """Double the per-tile capacity when truncation persists (VERDICT
        round-2 weak #2: dropped fragments are wrong images AND wrong
        gradients exactly where densify is misjudging). Costs one recompile
        of the train step at the next call."""
        cfg = self.config
        interval = max(cfg.densification_interval, 1)
        per_step = trunc_accum / interval
        if per_step <= 0:
            return
        self.log(
            f"[truncation @ {self.step}] {trunc_accum} fragments dropped "
            f"since last event ({per_step:.0f}/step) at "
            f"max_per_tile={self.render_cfg.max_per_tile}"
        )
        if not cfg.adapt_max_per_tile:
            return
        # after densification ends the population is fixed (modulo nothing —
        # no more events), so any persistent truncation would sit in the
        # final-phase metrics forever; use the stricter trigger (VERDICT
        # round-3 next #3: steady-state truncated == 0 is an invariant)
        trigger = (
            cfg.adapt_trunc_final_per_step
            if self.step > cfg.densify_until_iter
            else cfg.adapt_trunc_per_step
        )
        k = self.render_cfg.max_per_tile
        if per_step > trigger and k < cfg.max_per_tile_limit:
            new_k = min(2 * k, cfg.max_per_tile_limit)
            self.log(
                f"[adapt @ {self.step}] raising max_per_tile {k} -> {new_k} "
                "(train step will recompile)"
            )
            self.render_cfg = self.render_cfg._replace(max_per_tile=new_k)
            self._train_step = make_train_step(
                self.config, self.render_cfg, self.dataset.img_wh,
                self.optimizer,
            )

    def _maybe_adapt_max_pairs(self, dropped_accum: int):
        """Double the global pair buffer when it overflowed (dropped whole
        gaussian-tile pairs = wrong pixels and wrong gradients, silently
        concentrated in the densest views). Any overflow triggers: unlike
        per-tile truncation there is no graceful-degradation argument — the
        binning sort scales with the static max_pairs, so the buffer is kept
        tight and grown only on demand."""
        cfg = self.config
        if dropped_accum <= 0:
            return
        self.log(
            f"[pair overflow @ {self.step}] {dropped_accum} pairs dropped "
            f"since last check at max_pairs={self.render_cfg.max_pairs}"
        )
        if not cfg.adapt_max_pairs or self.render_cfg.max_pairs is None:
            return
        p = self.render_cfg.max_pairs
        if p < cfg.max_pairs_limit:
            new_p = min(2 * p, cfg.max_pairs_limit)
            self.log(
                f"[adapt @ {self.step}] raising max_pairs {p} -> {new_p} "
                "(train step will recompile)"
            )
            self.render_cfg = self.render_cfg._replace(max_pairs=new_p)
            self._train_step = make_train_step(
                self.config, self.render_cfg, self.dataset.img_wh,
                self.optimizer,
            )

    def _post_densify_overflow_check(self):
        """Overflow adaptation after densification has ended.

        During the densify phase, events carry truncated/dropped accumulators
        to the adaptation hooks; past densify_until_iter there are no events,
        which is exactly when the r3b run was left dropping ~2.3k
        fragments/step with no mechanism to react. Poll the two scalar
        accumulators at the event cadence (one 2-int device fetch every
        densification_interval steps) and keep adapting."""
        tr, dr = jax.device_get(
            (self.stats.truncated_accum, self.stats.dropped_accum)
        )
        tr, dr = int(tr), int(dr)
        self._maybe_adapt_max_per_tile(tr - self._trunc_seen)
        self._maybe_adapt_max_pairs(dr - self._dropped_seen)
        self._trunc_seen, self._dropped_seen = tr, dr

    def run_step(self, P, K, target, mask=None):
        """One optimization step on a batch of cameras.

        mask: (B, H, W) pixel validity for mixed-size scenes (None = all
        cameras share img_wh)."""
        params = self.model.trainable()
        if self.config.reset_adam_every_step:
            # reference quirk (gs_control.py:199) — but even it drives lr
            # from the global iteration, so pin the schedule counters
            self.opt_state = set_schedule_counts(
                self.optimizer.init(params), self.step
            )
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
            cap_old = self.model.capacity
            use_2d = cfg.densify_stat == "grad2d"
            # official 3DGS enables BOTH big-point prunes (screen radius and
            # world-size 0.1*extent) only after the first opacity reset
            # (densify_and_prune's size_threshold arg); the reference's
            # always-on world prune stays reachable via world_prune_always
            size_active = bool(
                cfg.opacity_reset_interval
                and self.step > cfg.opacity_reset_interval
            )
            screen = cfg.max_screen_size if size_active else None
            self.model, self.stats, info = densify_and_prune(
                self.model,
                self.stats,
                self.extent,
                grad_threshold=(
                    cfg.grad2d_threshold
                    if use_2d
                    else self.hyper.value("grad_threshold")
                ),
                percent_dense=self.hyper.value("percent_dense"),
                prune_min_opacity=self.hyper.value("prunning_min_opacity"),
                split_n=cfg.split_n,
                rng=self._rng,
                reset_stats=cfg.reset_stats_after_densify,
                capacity_growth=cfg.capacity_growth,
                stat=cfg.densify_stat,
                max_screen_size=screen,
                max_alive=cfg.max_alive,
                growth_limit=cfg.growth_limit,
                world_prune=cfg.world_prune_always or size_active,
            )
            if cfg.morton_reorder:
                # spatial row order (adaptive/reorder.py); compose the adam
                # source map with the permutation so moment rows follow
                from simplegaussiansplat_tk71_tpu.adaptive.reorder import (
                    morton_permutation,
                    apply_permutation,
                )

                perm = morton_permutation(
                    np.asarray(self.model.mean), np.asarray(self.model.alive)
                )
                self.model, self.stats = apply_permutation(
                    self.model, self.stats, perm
                )
                info["adam_src"] = info["adam_src"][perm]
            adam_src = info.pop("adam_src")
            if cfg.preserve_adam_on_densify:
                self.opt_state = remap_opt_state(
                    self.optimizer, self.opt_state, self.model.trainable(),
                    adam_src, cap_old,
                )
                self.opt_state = set_schedule_counts(self.opt_state, self.step)
            else:
                self._reinit_opt()
            self.n_alive = int(info["alive"])
            info["step"] = self.step
            self.densify_events.append(info)
            if self.densify_cb is not None:
                self.densify_cb(info)
            self.log(
                f"[densify @ {self.step}] split={info['split']} "
                f"clone={info['clone']} prune={info['prune']} "
                f"(screen {info['screen_prune']}, capped {info['growth_capped']}) "
                f"alive={info['alive']} stat={info['stat']} "
                f"p90={info['score_p90']:.2e} p99={info['score_p99']:.2e}"
            )
            self._maybe_adapt_max_per_tile(info["truncated_accum"])
            self._maybe_adapt_max_pairs(info.get("dropped_accum", 0))
            self._trunc_seen = 0
            self._dropped_seen = 0
            if info["alive"] == 0 or info["prune"] > 2 * max(info["alive"], 1):
                self.log(
                    "WARNING: densify pruned most/all gaussians — scene "
                    f"extent ({self.extent:.3g}) is likely too small relative "
                    "to the gaussian scales (prune rule: max scale > 0.1 * "
                    "extent). Check camera poses / knn init."
                )
        if (
            (cfg.adapt_max_per_tile or cfg.adapt_max_pairs)
            and self.step > cfg.densify_until_iter
            and self.step % cfg.densification_interval == 0
        ):
            self._post_densify_overflow_check()
        if (
            cfg.opacity_reset_interval
            and self.step % cfg.opacity_reset_interval == 0
            # official-3DGS gating (opacity_reset_until > 0): resets only
            # while step < until — a reset at exactly step == until would be
            # outside the official densify-gated block (config.py)
            and (cfg.opacity_reset_until <= 0
                 or self.step < cfg.opacity_reset_until)
        ):
            self.model = reset_opacity(self.model, cfg.reset_opacity_min)
            if cfg.preserve_adam_on_densify:
                # official 3DGS zeroes only the opacity moments here
                # (replace_tensor_to_optimizer); a full rebuild would wipe
                # every group's curvature estimate
                self.opt_state = zero_group_adam_moments(
                    self.opt_state, "logit_opacity"
                )
            else:
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
                    extra=self.checkpoint_extra(),
                )
            if self.step >= num_steps:
                break
        logger.close()
        self.log(
            f"done: {self.step} steps in {(time.time() - t_start) / 60:.1f} min"
        )
        return self.model
