"""Morton (Z-order) reordering of the gaussian population.

Training math is permutation-invariant in the gaussian axis (projection is
per-row; binning sorts by (tile, depth) regardless of id order), so the row
order is free to choose — and a spatially-local order makes the
gaussian-major pair stream nearly tile-coherent, which is the enabler for
the MSB-partition binning sort (NOTES.md backlog 2b) and improves sort-key
coherence today.

Applied host-side at densify events (the optimizer is rebuilt there anyway —
trainer._reinit_opt — so only the model and densify stats need permuting).
Off by default (TrainConfig.morton_reorder). The reference has no
counterpart: its row order is insertion order (densify appends,
gs_model.py:201-243).
"""

import numpy as np


def _spread_bits_10(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit ints with two zero bits (uint64 in/out)."""
    x = x.astype(np.uint64) & np.uint64(0x3FF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
    return x


def morton_codes(xyz: np.ndarray, bbox_of: np.ndarray | None = None) -> np.ndarray:
    """(N, 3) positions -> (N,) uint64 Z-order codes (10 bits/axis).

    bbox_of: optional boolean row mask restricting the quantization bounding
    box (e.g. alive rows only — zero-padded dead rows would otherwise stretch
    the box and compress the alive rows' quantization range)."""
    xyz = np.asarray(xyz, np.float64)
    ref = xyz[bbox_of] if bbox_of is not None and bbox_of.any() else xyz
    lo = ref.min(axis=0)
    span = np.maximum(ref.max(axis=0) - lo, 1e-12)
    q = np.clip((xyz - lo) / span * 1023.0, 0.0, 1023.0).astype(np.uint64)
    return (
        _spread_bits_10(q[:, 0])
        | (_spread_bits_10(q[:, 1]) << np.uint64(1))
        | (_spread_bits_10(q[:, 2]) << np.uint64(2))
    )


def morton_permutation(mean_cn: np.ndarray, alive: np.ndarray) -> np.ndarray:
    """Stable permutation: alive rows in Z-order first, dead rows last.

    mean_cn: (3, C) component-major means; alive: (C,) bool.
    """
    mean = np.asarray(mean_cn).T  # (C, 3)
    alive = np.asarray(alive).astype(bool)
    codes = morton_codes(mean, bbox_of=alive)
    # dead rows sort after every alive row regardless of position
    key = np.where(alive, codes, np.uint64(0xFFFFFFFFFFFFFFFF))
    return np.argsort(key, kind="stable")


def apply_permutation(model, stats, perm: np.ndarray):
    """Permute a GaussianModel + DensifyStats along the gaussian axis."""
    import jax.numpy as jnp

    def take(x):
        a = np.asarray(x)
        return jnp.asarray(a[..., perm] if a.ndim == 2 else a[perm])

    model = model._replace(
        mean=take(model.mean),
        quat=take(model.quat),
        log_scale=take(model.log_scale),
        logit_opacity=take(model.logit_opacity),
        sh=take(model.sh),
        alive=take(model.alive),
    )
    def take_opt(x):  # per-gaussian stat fields may be None (legacy stats)
        return None if x is None else take(x)

    stats = stats._replace(
        grad_norm_accum=take(stats.grad_norm_accum),
        visible_count=take(stats.visible_count),
        grad2d_accum=take_opt(stats.grad2d_accum),
        vis2d_count=take_opt(stats.vis2d_count),
        max_radius2d=take_opt(stats.max_radius2d),
    )
    return model, stats


def morton_reorder(model, stats):
    """Z-order the alive gaussians; returns (model, stats) permuted."""
    perm = morton_permutation(np.asarray(model.mean), np.asarray(model.alive))
    return apply_permutation(model, stats, perm)
