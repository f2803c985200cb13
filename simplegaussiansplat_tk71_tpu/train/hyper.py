"""Learnable hyperparameter containers (reference component C7).

The reference wraps its densification thresholds and learning rates in
``torch.nn.Parameter`` tensors with a dedicated Adam optimizer
(gs_model.py:76-119, ``_GS_model_with_ultra_param`` /
``_GS_model_with_super_param``) — frozen in practice
(``changing_required_grad(False)`` at construction) but structured so that
meta-gradients *could* update them.

TPU-native counterpart: the hyperparameters live in a flat JAX pytree with
its own ``optax.adam`` state. ``learnable=False`` (the reference's default)
makes ``update()`` the identity; when enabled, ``update(grads)`` applies one
Adam step to exactly the fields gradients were supplied for. The Trainer
reads densify/prune thresholds *through* this container at every densify
event, so an updated value takes effect without rebuilding the jitted train
step (thresholds are consumed host-side, exactly like the reference's
``.item()`` reads).

Like the reference, ``variance_pixel_tile_max_width`` is stored in logit
space (gs_model.py:83) so Adam steps keep it in (0, 1).
"""

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
import optax

# (name, stored-in-logit-space) — the union of the reference's "ultra"
# (densify thresholds, gs_model.py:77-89) and "super" (lrs + prune floor,
# gs_model.py:92-119) parameter sets.
_FIELDS = {
    # ultra
    "grad_delta_upper_limit": False,
    "grad_threshold": False,
    "percent_dense": False,
    "variance_pixel_tile_max_width": True,
    # super
    "position_lr_init": False,
    "position_lr_final": False,
    "position_lr_delay_mult": False,
    "position_lr_max_steps": False,
    "feature_lr": False,
    "opacity_lr": False,
    "scaling_lr": False,
    "rotation_lr": False,
    "prunning_min_opacity": False,  # reference's spelling, kept for parity
}


def _logit(x):
    x = jnp.clip(x, 1e-6, 1.0 - 1e-6)
    return jnp.log(x) - jnp.log1p(-x)


class HyperParams(NamedTuple):
    """Flat scalar pytree; raw (possibly logit-space) storage."""

    raw: Dict[str, jnp.ndarray]

    def value(self, name: str) -> float:
        """Host-side read of one hyperparameter in natural units."""
        v = np.asarray(self.raw[name])
        if _FIELDS[name]:
            v = 1.0 / (1.0 + np.exp(-v))
        return float(v)

    def values(self) -> Dict[str, float]:
        return {k: self.value(k) for k in self.raw}


class HyperState:
    """Hyperparameters + their dedicated Adam, frozen unless ``learnable``."""

    def __init__(
        self,
        init: Dict[str, float],
        lr: float = 0.01,
        learnable: bool = False,
    ):
        raw = {}
        for k, v in init.items():
            if k not in _FIELDS:
                raise ValueError(f"unknown hyperparameter {k!r}")
            x = jnp.asarray(v, jnp.float32)
            raw[k] = _logit(x) if _FIELDS[k] else x
        self.params = HyperParams(raw=raw)
        self.learnable = learnable
        self.optimizer = optax.adam(lr)
        self.opt_state = self.optimizer.init(self.params.raw)

    @classmethod
    def from_config(cls, cfg, lr: float = 0.01, learnable: bool = False):
        """Populate from TrainConfig with the reference's field mapping."""
        return cls(
            {
                "grad_delta_upper_limit": cfg.grad_delta_upper_limit,
                "grad_threshold": cfg.grad_threshold,
                "percent_dense": cfg.percent_dense,
                "variance_pixel_tile_max_width": 0.9,
                "position_lr_init": cfg.position_lr_init,
                "position_lr_final": cfg.position_lr_final,
                "position_lr_delay_mult": cfg.position_lr_delay_mult,
                "position_lr_max_steps": float(cfg.position_lr_max_steps),
                "feature_lr": cfg.feature_lr,
                "opacity_lr": cfg.opacity_lr,
                "scaling_lr": cfg.scaling_lr,
                "rotation_lr": cfg.rotation_lr,
                "prunning_min_opacity": cfg.prune_min_opacity,
            },
            lr=lr,
            learnable=learnable,
        )

    def value(self, name: str) -> float:
        return self.params.value(name)

    def set_value(self, name: str, value: float) -> "HyperState":
        """Host-side write in natural units — the supported path for
        config-driven threshold schedules (the Trainer snapshots TrainConfig
        into this container at construction; mutating trainer.config later
        has no effect)."""
        if name not in _FIELDS:
            raise ValueError(f"unknown hyperparameter {name!r}")
        x = jnp.asarray(value, jnp.float32)
        raw = dict(self.params.raw)
        raw[name] = _logit(x) if _FIELDS[name] else x
        self.params = HyperParams(raw=raw)
        return self

    def update(self, grads: Optional[Dict[str, jnp.ndarray]]):
        """One Adam step from meta-gradients; identity when frozen.

        ``grads`` maps a SUBSET of field names to scalar gradients — fields
        without a gradient get zero (Adam moments still decay, matching
        torch semantics where .grad is zeroed).
        """
        if not self.learnable or not grads:
            return self
        full = {
            k: jnp.asarray(grads.get(k, 0.0), jnp.float32)
            for k in self.params.raw
        }
        updates, self.opt_state = self.optimizer.update(
            full, self.opt_state, self.params.raw
        )
        self.params = HyperParams(raw=optax.apply_updates(self.params.raw, updates))
        return self
