"""Gaussian scene parameters as a capacity-padded pytree.

The reference stores parameters as five nn.Parameters whose leading dim N
changes on every densify/prune (gs_model.py:151-158, 201-265), forcing a fresh
optimizer each time. XLA wants static shapes, so we allocate at a capacity C
rounded up to a bucket size and carry an ``alive`` mask; densify/prune edit
rows and the mask without recompiling until capacity is exceeded (SURVEY.md
section 7.1 item 3).

Parameterization (same quantities as the reference, component-major: an
(N, few-columns) f32 buffer pads its minor dim to the TPU's (8, 128) tile at
14-42x memory and elementwise traffic — NOTES.md layout tax — while (C, N)
component rows are dense; measured 7.3 -> 0.5 ms for the Adam update of one
(1M, 3) leaf):
  mean (3, C) world position               gs_model.py:151
  quat (4, C) xyzw rotation                gs_model.py:152 (variance_q)
  log_scale (3, C)                         gs_model.py:153 (variance_scale)
  logit_opacity (C,)                       gs_model.py:154 (opacity)
  sh ((L+1)^2 * 3, C) packed SH rows       gs_model.py:156-158 (color)
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# c00 init makes the base color sigmoid-free ~0.5 (c_00=1.77, gs_model.py:139).
DEFAULT_C00 = 1.77
CAPACITY_BUCKET = 4096


class GaussianModel(NamedTuple):
    mean: jnp.ndarray
    quat: jnp.ndarray
    log_scale: jnp.ndarray
    logit_opacity: jnp.ndarray
    sh: jnp.ndarray
    alive: jnp.ndarray  # (C,) bool — NOT trainable; split out by train code

    @property
    def capacity(self) -> int:
        return self.mean.shape[1]

    @property
    def sh_degree(self) -> int:
        return int(round(np.sqrt(self.sh.shape[0] // 3))) - 1

    def num_alive(self):
        return jnp.sum(self.alive)

    def trainable(self) -> dict:
        return {
            "mean": self.mean,
            "quat": self.quat,
            "log_scale": self.log_scale,
            "logit_opacity": self.logit_opacity,
            "sh": self.sh,
        }

    def with_trainable(self, params: dict) -> "GaussianModel":
        return GaussianModel(
            mean=params["mean"],
            quat=params["quat"],
            log_scale=params["log_scale"],
            logit_opacity=params["logit_opacity"],
            sh=params["sh"],
            alive=self.alive,
        )


def round_capacity(n: int, bucket: int = CAPACITY_BUCKET) -> int:
    return max(bucket, -(-n // bucket) * bucket)


def init_from_points(
    xyz: np.ndarray,
    knn_mean_dist: np.ndarray,
    opacity_init: float = 0.1,
    sh_degree: int = 2,
    c00: float = DEFAULT_C00,
    capacity: int | None = None,
) -> GaussianModel:
    """Initialize from an SfM point cloud.

    Matches the reference init (gs_control.py:111-118, gs_model.py:156-158):
    mean = xyz, quat = identity (0,0,0,1), log_scale = log(mean 3-NN dist),
    logit_opacity = logit(0.1), sh base coefficient c00=1.77 rest zero.

    knn_mean_dist: (N,) mean distance to k nearest neighbors (utils.knn).
    """
    n = xyz.shape[0]
    cap = capacity if capacity is not None else round_capacity(n)
    nb = (sh_degree + 1) ** 2

    mean = np.zeros((3, cap), np.float32)
    mean[:, :n] = xyz.T
    quat = np.zeros((4, cap), np.float32)
    quat[3, :] = 1.0
    log_scale = np.full((3, cap), -10.0, np.float32)  # dead rows: tiny
    log_scale[:, :n] = np.log(np.maximum(knn_mean_dist, 1e-7))[None, :]
    logit_op = np.full(
        (cap,), float(np.log(opacity_init / (1.0 - opacity_init))), np.float32
    )
    # packed SH rows (basis-major, channel-minor): a (cap, nb, 3) device
    # tensor pads its minor dims to the TPU (8, 128) tile at 42-76x memory
    sh = np.zeros((nb * 3, cap), np.float32)
    sh[0:3, :] = c00
    alive = np.zeros((cap,), bool)
    alive[:n] = True

    return GaussianModel(
        mean=jnp.asarray(mean),
        quat=jnp.asarray(quat),
        log_scale=jnp.asarray(log_scale),
        logit_opacity=jnp.asarray(logit_op),
        sh=jnp.asarray(sh),
        alive=jnp.asarray(alive),
    )
