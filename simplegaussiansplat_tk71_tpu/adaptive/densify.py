"""Adaptive densification: split / clone / prune / opacity reset.

Host-side re-implementation of the reference's densification
(gs_model.py:190-271), operating on the capacity-padded GaussianModel. The
edits run outside jit every ``densification_interval`` steps (default 100), so
dynamic row counts are fine; the jitted train step never changes shapes. The
capacity only grows (in buckets), so recompiles are rare and amortized.

Two selection statistics are supported (``stat``):

- ``"grad3d"`` — the reference's: accumulated 3-D ||dL/dmean|| divided by the
  number of steps the gaussian was visible in >= 1 camera (param_iter_update /
  param_grads_per_iter_norm, gs_model.py:190-199). The 3-D norm inherits the
  scene's world scale, and the reference carries stats through split/clone
  without reset — both kept here for parity.
- ``"grad2d"`` — official-3DGS: accumulated screen-space ||dL/dmean2d|| (in
  half-image units, i.e. the pixel-space gradient scaled by (W/2, H/2)),
  divided by a per-(step, camera) visibility count. Children do NOT inherit
  the parent's accumulator (they are new points). This is the
  scale-invariant statistic; the round-2 quality run diverged under grad3d
  (VERDICT.md round 2, "What's weak" #1).

Semantics matched to the reference (shared by both stats):
- split (gs_model.py:201-227): selected AND max(scale) > percent_dense *
  extent; N=2 children sampled ~ Normal(0, S) rotated by the gaussian's R,
  child scale = log(S / (0.8 * N)); originals removed.
- clone (gs_model.py:229-243): selected AND max(scale) <= percent_dense *
  extent; duplicated in place.
- prune (gs_model.py:245-261): sigmoid(opacity) < prune_min_opacity OR
  max(scale) > 0.1 * extent. Optionally also screen-space radius >
  ``max_screen_size`` pixels (official-3DGS big-point prune; the reference
  lacks it, which lets overdense clusters survive).
- reset_opacity (gs_model.py:267-271): opacity = logit(min(sigmoid(o), eps)).

Growth control (new; no reference counterpart — its unbounded growth is what
made the round-2 run explode 19k -> 5.1M): ``max_alive`` caps the absolute
population and ``growth_limit`` caps per-event growth; when the selection
exceeds the budget, the highest-score candidates win.

The returned ``info["adam_src"]`` maps each new row to the old capacity row
whose Adam moments it should keep (-1 = fresh row, zero moments) — official
3DGS preserves optimizer state for surviving rows (cat_tensors_to_optimizer);
the reference rebuilds Adam wholesale (gs_model.py:263).
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from simplegaussiansplat_tk71_tpu.models.gaussians import (
    GaussianModel,
    round_capacity,
)


class DensifyStats(NamedTuple):
    """Carried through the jitted train step (updated there).

    grad_norm_accum / visible_count: the reference's 3-D statistic.
    grad2d_accum / vis2d_count: official-3DGS screen-space statistic
    (per-camera visibility denominator).
    max_radius2d: running max screen radius (pixels) for the screen-size
    prune. truncated_accum: scalar count of per-tile-truncated fragments
    since the last densify event (drives max_per_tile adaptation — VERDICT
    round 2 weak #2: truncation was reported but never acted on).
    """

    grad_norm_accum: jnp.ndarray  # (C,) sum of ||dL/dmean|| per gaussian
    visible_count: jnp.ndarray  # (C,) int32 any-camera per-step counter
    grad2d_accum: Optional[jnp.ndarray] = None  # (C,) screen-space accum
    vis2d_count: Optional[jnp.ndarray] = None  # (C,) int32 per-camera counter
    max_radius2d: Optional[jnp.ndarray] = None  # (C,) max screen radius, px
    truncated_accum: Optional[jnp.ndarray] = None  # () int32
    dropped_accum: Optional[jnp.ndarray] = None  # () int32 pairs lost to
    # max_pairs overflow since the last densify event (drives max_pairs
    # adaptation, same contract as truncated_accum)

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyStats":
        return cls(
            grad_norm_accum=jnp.zeros((capacity,), jnp.float32),
            visible_count=jnp.zeros((capacity,), jnp.int32),
            grad2d_accum=jnp.zeros((capacity,), jnp.float32),
            vis2d_count=jnp.zeros((capacity,), jnp.int32),
            max_radius2d=jnp.zeros((capacity,), jnp.float32),
            truncated_accum=jnp.zeros((), jnp.int32),
            dropped_accum=jnp.zeros((), jnp.int32),
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


def _np_or_zeros(x, capacity, dtype):
    if x is None:
        return np.zeros((capacity,), dtype)
    return np.asarray(x)


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
    stat: str = "grad3d",
    max_screen_size: float | None = None,
    max_alive: int | None = None,
    growth_limit: float | None = None,
    world_prune: bool = True,
):
    """Returns (new_model, new_stats, info dict). Host-side (numpy).

    capacity_growth: when the live count outgrows the buffer, grow capacity
    to at least ``capacity_growth * old_capacity`` (geometric, amortized
    recompiles — a steadily-densifying run would otherwise recompile the jit
    graph at nearly every densify event since buckets are only 4096 wide).
    1.0 = tightest bucket (tests / CPU, where compiles are cheap).

    stat / max_screen_size / max_alive / growth_limit: see module docstring.
    info["adam_src"]: (new_capacity,) int32 old-capacity source row per new
    row (-1 = fresh), for optimizer-moment preservation.
    """
    rng = rng or np.random.default_rng(0)
    cap_old = model.capacity

    # model storage is component-major (C, N) on device (NOTES.md layout
    # tax); densify logic runs row-major in numpy — transpose at the edges
    # (cheap host copies). ONE bulk device_get: each per-array fetch is a
    # full RPC round trip on a tunneled TPU, and a densify event reads ~11
    # arrays (the serial fetches dominated the ~8 s/event seen in the
    # round-3 quality run).
    import jax

    (alive, mean_d, quat_d, lsc_d, lop_d, sh_d, gn_d, gi_d, g2_d, g2i_d,
     rad_d, trunc_d, drop_d) = jax.device_get((
        model.alive, model.mean, model.quat, model.log_scale,
        model.logit_opacity, model.sh, stats.grad_norm_accum,
        stats.visible_count, stats.grad2d_accum, stats.vis2d_count,
        stats.max_radius2d, stats.truncated_accum, stats.dropped_accum,
    ))
    alive = np.asarray(alive)
    rows = np.where(alive)[0].astype(np.int64)  # old capacity row per alive
    mean = np.asarray(mean_d).T[alive]
    quat = np.asarray(quat_d).T[alive]
    log_scale = np.asarray(lsc_d).T[alive]
    logit_op = np.asarray(lop_d)[alive][:, None]
    sh = np.asarray(sh_d).T[alive]
    g_norm = np.asarray(gn_d)[alive]
    g_iter = np.asarray(gi_d)[alive]
    g2d = _np_or_zeros(g2_d, cap_old, np.float32)[alive]
    g2d_iter = _np_or_zeros(g2i_d, cap_old, np.int32)[alive]
    radius = _np_or_zeros(rad_d, cap_old, np.float32)[alive]
    trunc_accum_host = int(trunc_d) if trunc_d is not None else 0
    drop_accum_host = int(drop_d) if drop_d is not None else 0
    n_alive0 = len(mean)

    # adam_src: survivors keep their moments; children/clones start fresh.
    # stat_src: the reference CARRIES accumulators through split/clone
    # (module docstring) — only meaningful for grad3d parity.
    adam_src = rows.copy()
    stat_src = rows.copy()

    if stat == "grad2d":
        score = g2d / np.maximum(g2d_iter, 1)
    elif stat == "grad3d":
        score = g_norm / np.maximum(g_iter, 1)
    else:
        raise ValueError(f"unknown densify stat {stat!r}")

    scale = np.exp(log_scale)
    big = scale.max(axis=1) > percent_dense * extent
    selected = score >= grad_threshold
    sel_split = selected & big
    sel_clone = selected & ~big

    # --- growth budget: cap net added gaussians, best-score-first ---
    budget = None
    if max_alive is not None:
        budget = max(0, int(max_alive) - n_alive0)
    if growth_limit is not None:
        g = max(0, int((float(growth_limit) - 1.0) * n_alive0 + 1e-6))
        budget = g if budget is None else min(budget, g)
    n_capped = 0
    if budget is not None:
        net_add = sel_split.astype(np.int64) * (split_n - 1) + sel_clone.astype(
            np.int64
        )
        total = int(net_add.sum())
        if total > budget:
            cand = np.where(selected)[0]
            order = cand[np.argsort(-score[cand], kind="stable")]
            cum = np.cumsum(net_add[order])
            keep_cand = order[cum <= budget]
            newsel = np.zeros_like(selected)
            newsel[keep_cand] = True
            n_capped = int(selected.sum() - newsel.sum())
            sel_split &= newsel
            sel_clone &= newsel

    # --- split ---
    n_split = int(sel_split.sum())
    if n_split:
        sel = sel_split
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
        g2d = np.concatenate([g2d[keep], np.zeros(n_split * split_n, np.float32)])
        g2d_iter = np.concatenate(
            [g2d_iter[keep], np.zeros(n_split * split_n, np.int32)]
        )
        radius = np.concatenate(
            [radius[keep], np.zeros(n_split * split_n, np.float32)]
        )
        adam_src = np.concatenate(
            [adam_src[keep], np.full(n_split * split_n, -1, np.int64)]
        )
        stat_src = np.concatenate([stat_src[keep], np.tile(stat_src[sel], split_n)])
        sel_clone = np.concatenate(
            [sel_clone[keep], np.zeros(n_split * split_n, bool)]
        )

    # --- clone (on the post-split arrays, 3-D stats carried) ---
    sel = sel_clone
    n_clone = int(sel.sum())
    if n_clone:
        mean = np.concatenate([mean, mean[sel]])
        quat = np.concatenate([quat, quat[sel]])
        log_scale = np.concatenate([log_scale, log_scale[sel]])
        logit_op = np.concatenate([logit_op, logit_op[sel]])
        sh = np.concatenate([sh, sh[sel]])
        g_norm = np.concatenate([g_norm, g_norm[sel]])
        g_iter = np.concatenate([g_iter, g_iter[sel]])
        g2d = np.concatenate([g2d, np.zeros(n_clone, np.float32)])
        g2d_iter = np.concatenate([g2d_iter, np.zeros(n_clone, np.int32)])
        radius = np.concatenate([radius, np.zeros(n_clone, np.float32)])
        adam_src = np.concatenate([adam_src, np.full(n_clone, -1, np.int64)])
        stat_src = np.concatenate([stat_src, stat_src[sel]])

    # --- prune ---
    sig_op = 1.0 / (1.0 + np.exp(-logit_op[:, 0]))
    prune = sig_op < prune_min_opacity
    if world_prune:
        # world-size big-point prune (reference gs_model.py:250-253 applies
        # it at every event; official 3DGS gates it with the screen prune —
        # the Trainer passes the gate, direct callers get reference behavior)
        prune |= np.exp(log_scale).max(axis=1) > 0.1 * extent
    n_screen_prune = 0
    if max_screen_size is not None:
        screen = radius > float(max_screen_size)
        n_screen_prune = int((screen & ~prune).sum())
        prune |= screen
    n_prune = int(prune.sum())
    keep = ~prune
    mean, quat, log_scale, logit_op, sh = (
        mean[keep], quat[keep], log_scale[keep], logit_op[keep], sh[keep]
    )
    g_norm, g_iter = g_norm[keep], g_iter[keep]
    g2d, g2d_iter, radius = g2d[keep], g2d_iter[keep], radius[keep]
    adam_src, stat_src = adam_src[keep], stat_src[keep]

    # --- repack into (possibly grown) capacity ---
    n = len(mean)
    cap = model.capacity
    if n > cap:
        cap = round_capacity(max(n, int(cap * capacity_growth)))

    def pack(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return out

    def pack_t(x, fill=0.0):
        out = np.full((cap, x.shape[1]), fill, x.dtype)
        out[:n] = x
        return np.ascontiguousarray(out.T)

    quat_packed = np.zeros((cap, 4), np.float32)
    quat_packed[:, 3] = 1.0  # identity fill: zero quats have degenerate grads
    quat_packed[:n] = quat
    new_model = GaussianModel(
        mean=pack_t(mean),
        quat=np.ascontiguousarray(quat_packed.T),
        log_scale=pack_t(log_scale, fill=-10.0),
        logit_opacity=pack(logit_op[:, 0]),
        sh=pack_t(sh),
        alive=np.arange(cap) < n,
    )
    if reset_stats:
        new_stats = DensifyStats.zeros(cap)
    else:
        new_stats = DensifyStats(
            grad_norm_accum=pack(g_norm),
            visible_count=pack(g_iter),
            grad2d_accum=pack(g2d),
            vis2d_count=pack(g2d_iter),
            max_radius2d=pack(radius),
            truncated_accum=np.zeros((), np.int32),
            dropped_accum=np.zeros((), np.int32),
        )
    # ONE bulk host->device transfer (mirror of the bulk fetch above)
    new_model, new_stats = jax.device_put((new_model, new_stats))
    adam_src_full = np.full((cap,), -1, np.int32)
    adam_src_full[:n] = adam_src.astype(np.int32)
    sel_scores = score[selected] if selected.any() else np.zeros((1,))
    info = {
        "split": n_split,
        "clone": n_clone,
        "prune": n_prune,
        "alive": n,
        "stat": stat,
        "threshold": float(grad_threshold),
        "screen_prune": n_screen_prune,
        "growth_capped": n_capped,
        "adam_src": adam_src_full,
        # selection-score calibration telemetry (VERDICT round-2 next #1:
        # "instrument every densify event")
        "score_p50": float(np.median(score)) if len(score) else 0.0,
        "score_p90": float(np.quantile(score, 0.9)) if len(score) else 0.0,
        "score_p99": float(np.quantile(score, 0.99)) if len(score) else 0.0,
        "score_max": float(score.max()) if len(score) else 0.0,
        "sel_score_min": float(sel_scores.min()),
        "truncated_accum": trunc_accum_host,
        "dropped_accum": drop_accum_host,
    }
    return new_model, new_stats, info


def reset_opacity(model: GaussianModel, reset_min: float = 0.01) -> GaussianModel:
    """opacity <- logit(min(sigmoid(o), reset_min)) (gs_model.py:267-271)."""
    sig = 1.0 / (1.0 + jnp.exp(-model.logit_opacity))
    clamped = jnp.minimum(sig, reset_min)
    new_logit = jnp.log(clamped) - jnp.log1p(-clamped)
    return model._replace(logit_opacity=new_logit.astype(jnp.float32))
