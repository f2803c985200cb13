"""Per-parameter-group Adam with the Plenoxels position-lr schedule.

Reference: the lr dict + fresh-Adam-per-group (gs_model.py:43-47,160-165) and
Utilities.get_expon_lr_func (uitility.py:573-606). Here it is one optax
multi_transform whose position branch takes the log-lerp exponential schedule;
state persists across steps by default (the reference rebuilds Adam every
iteration, gs_control.py:197-199 — available as a parity quirk by resetting
state externally).
"""

import jax.numpy as jnp
import optax


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linear interpolation from lr_init to lr_final (Plenoxels/JaxNeRF),
    optionally eased by a reverse-cosine delay (uitility.py:591-605)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(
            jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
        )
        return delay_rate * log_lerp

    return schedule


def make_optimizer(config) -> optax.GradientTransformation:
    """Adam per parameter group, lrs from TrainConfig (gs_control.py:42-49)."""
    position_schedule = expon_lr_schedule(
        config.position_lr_init,
        config.position_lr_final,
        lr_delay_steps=0,  # reference passes delay_steps=0 (gs_model.py:160-162)
        lr_delay_mult=config.position_lr_delay_mult,
        max_steps=config.position_lr_max_steps,
    )
    # torch.optim.Adam defaults (reference gs_model.py:47)
    adam = lambda lr: optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    return optax.multi_transform(
        {
            "mean": adam(position_schedule),
            "quat": adam(config.rotation_lr),
            "log_scale": adam(config.scaling_lr),
            "logit_opacity": adam(config.opacity_lr),
            "sh": adam(config.feature_lr),
        },
        param_labels={
            "mean": "mean",
            "quat": "quat",
            "log_scale": "log_scale",
            "logit_opacity": "logit_opacity",
            "sh": "sh",
        },
    )
