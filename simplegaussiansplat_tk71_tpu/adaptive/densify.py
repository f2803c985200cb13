"""Adaptive densification: split / clone / prune / opacity reset.

Host-side re-implementation of the reference's densification
(gs_model.py:190-271), operating on the capacity-padded GaussianModel. The
edits run outside jit every ``densification_interval`` steps (default 100), so
dynamic row counts are fine; the jitted train step never changes shapes. The
capacity only grows (in buckets), so recompiles are rare and amortized.

Semantics matched to the reference:
- selection statistic: accumulated ||dL/dmean|| divided by the number of
  iterations the gaussian was *visible* (param_iter_update /
  param_grads_per_iter_norm, gs_model.py:190-199). Note the reference
  accumulates the 3D position-gradient norm (not the official-3DGS 2D one).
- split (gs_model.py:201-227): avg-grad >= threshold AND max(scale) >
  percent_dense * extent; N=2 children sampled ~ Normal(0, S) rotated by the
  gaussian's R, child scale = log(S / (0.8 * N)); originals removed.
- clone (gs_model.py:229-243): avg-grad >= threshold AND max(scale) <=
  percent_dense * extent; duplicated in place.
- prune (gs_model.py:245-261): sigmoid(opacity) < prune_min_opacity OR
  max(scale) > 0.1 * extent.
- stats are carried through split/clone and NOT reset (reference behavior;
  ``reset_stats`` opts into the official-3DGS reset).
- reset_opacity (gs_model.py:267-271): opacity = logit(min(sigmoid(o), eps)).
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from simplegaussiansplat_tk71_tpu.models.gaussians import (
    GaussianModel,
    round_capacity,
)


class DensifyStats(NamedTuple):
    """Carried through the jitted train step (updated there) — (C,) arrays."""

    grad_norm_accum: jnp.ndarray  # sum of ||dL/dmean|| per gaussian
    visible_count: jnp.ndarray  # int32 visibility counter

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyStats":
        return cls(
            grad_norm_accum=jnp.zeros((capacity,), jnp.float32),
            visible_count=jnp.zeros((capacity,), jnp.int32),
        )


def _quat_rotmat_np(q):
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-8)
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty((len(q), 3, 3), np.float32)
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - w * z)
    R[:, 0, 2] = 2 * (x * z + w * y)
    R[:, 1, 0] = 2 * (x * y + w * z)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - w * x)
    R[:, 2, 0] = 2 * (x * z - w * y)
    R[:, 2, 1] = 2 * (y * z + w * x)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def densify_and_prune(
    model: GaussianModel,
    stats: DensifyStats,
    extent: float,
    grad_threshold: float = 0.0004,
    percent_dense: float = 0.01,
    prune_min_opacity: float = 0.005,
    split_n: int = 2,
    rng: np.random.Generator | None = None,
    reset_stats: bool = False,
    capacity_growth: float = 1.0,
):
    """Returns (new_model, new_stats, info dict). Host-side (numpy).

    capacity_growth: when the live count outgrows the buffer, grow capacity
    to at least ``capacity_growth * old_capacity`` (geometric, amortized
    recompiles — a steadily-densifying run would otherwise recompile the jit
    graph at nearly every densify event since buckets are only 4096 wide).
    1.0 = tightest bucket (tests / CPU, where compiles are cheap)."""
    rng = rng or np.random.default_rng(0)

    # model storage is component-major (C, N) on device (NOTES.md layout
    # tax); densify logic runs row-major in numpy — transpose at the edges
    # (cheap host copies)
    alive = np.asarray(model.alive)
    mean = np.asarray(model.mean).T[alive]
    quat = np.asarray(model.quat).T[alive]
    log_scale = np.asarray(model.log_scale).T[alive]
    logit_op = np.asarray(model.logit_opacity)[alive][:, None]
    sh = np.asarray(model.sh).T[alive]
    g_norm = np.asarray(stats.grad_norm_accum)[alive]
    g_iter = np.asarray(stats.visible_count)[alive]

    def avg_grad(gn, gi):
        return gn / np.maximum(gi, 1)

    # --- split ---
    scale = np.exp(log_scale)
    sel = (avg_grad(g_norm, g_iter) >= grad_threshold) & (
        scale.max(axis=1) > percent_dense * extent
    )
    n_split = int(sel.sum())
    if n_split:
        stds = np.tile(scale[sel], (split_n, 1))
        samples = rng.normal(0.0, stds).astype(np.float32)
        rots = np.tile(_quat_rotmat_np(quat[sel]), (split_n, 1, 1))
        child_mean = (
            np.einsum("nij,nj->ni", rots, samples)
            + np.tile(mean[sel], (split_n, 1))
        ).astype(np.float32)
        child_scale = np.log(
            np.tile(scale[sel], (split_n, 1)) / (0.8 * split_n)
        ).astype(np.float32)
        keep = ~sel
        mean = np.concatenate([mean[keep], child_mean])
        quat = np.concatenate([quat[keep], np.tile(quat[sel], (split_n, 1))])
        log_scale = np.concatenate([log_scale[keep], child_scale])
        logit_op = np.concatenate([logit_op[keep], np.tile(logit_op[sel], (split_n, 1))])
        sh = np.concatenate([sh[keep], np.tile(sh[sel], (split_n, 1))])
        g_norm = np.concatenate([g_norm[keep], np.tile(g_norm[sel], split_n)])
        g_iter = np.concatenate([g_iter[keep], np.tile(g_iter[sel], split_n)])

    # --- clone (on the post-split arrays, stats carried) ---
    scale = np.exp(log_scale)
    sel = (avg_grad(g_norm, g_iter) >= grad_threshold) & (
        scale.max(axis=1) <= percent_dense * extent
    )
    n_clone = int(sel.sum())
    if n_clone:
        mean = np.concatenate([mean, mean[sel]])
        quat = np.concatenate([quat, quat[sel]])
        log_scale = np.concatenate([log_scale, log_scale[sel]])
        logit_op = np.concatenate([logit_op, logit_op[sel]])
        sh = np.concatenate([sh, sh[sel]])
        g_norm = np.concatenate([g_norm, g_norm[sel]])
        g_iter = np.concatenate([g_iter, g_iter[sel]])

    # --- prune ---
    sig_op = 1.0 / (1.0 + np.exp(-logit_op[:, 0]))
    prune = (sig_op < prune_min_opacity) | (
        np.exp(log_scale).max(axis=1) > 0.1 * extent
    )
    n_prune = int(prune.sum())
    keep = ~prune
    mean, quat, log_scale, logit_op, sh = (
        mean[keep], quat[keep], log_scale[keep], logit_op[keep], sh[keep]
    )
    g_norm, g_iter = g_norm[keep], g_iter[keep]

    # --- repack into (possibly grown) capacity ---
    n = len(mean)
    cap = model.capacity
    if n > cap:
        cap = round_capacity(max(n, int(cap * capacity_growth)))

    def pack(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return jnp.asarray(out)

    def pack_t(x, fill=0.0):
        out = np.full((cap, x.shape[1]), fill, x.dtype)
        out[:n] = x
        return jnp.asarray(np.ascontiguousarray(out.T))

    quat_packed = np.zeros((cap, 4), np.float32)
    quat_packed[:, 3] = 1.0  # identity fill: zero quats have degenerate grads
    quat_packed[:n] = quat
    new_model = GaussianModel(
        mean=pack_t(mean),
        quat=jnp.asarray(np.ascontiguousarray(quat_packed.T)),
        log_scale=pack_t(log_scale, fill=-10.0),
        logit_opacity=pack(logit_op[:, 0]),
        sh=pack_t(sh),
        alive=jnp.asarray(np.arange(cap) < n),
    )
    if reset_stats:
        new_stats = DensifyStats.zeros(cap)
    else:
        new_stats = DensifyStats(
            grad_norm_accum=pack(g_norm), visible_count=pack(g_iter)
        )
    info = {"split": n_split, "clone": n_clone, "prune": n_prune, "alive": n}
    return new_model, new_stats, info


def reset_opacity(model: GaussianModel, reset_min: float = 0.01) -> GaussianModel:
    """opacity <- logit(min(sigmoid(o), reset_min)) (gs_model.py:267-271)."""
    sig = 1.0 / (1.0 + jnp.exp(-model.logit_opacity))
    clamped = jnp.minimum(sig, reset_min)
    new_logit = jnp.log(clamped) - jnp.log1p(-clamped)
    return model._replace(logit_opacity=new_logit.astype(jnp.float32))
