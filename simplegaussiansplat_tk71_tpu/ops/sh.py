"""Real spherical-harmonics color evaluation.

The reference imports ``eval_sh`` from a ``sh_utility`` module that does not
exist in its repo (reference gs_model.py:9, call site gs_model.py:335-338); the
call signature and surrounding code identify it as the standard 3DGS polynomial
SH evaluator (degree <= 3, hardcoded real-SH constants). This module supplies a
JAX implementation with that exact contract:

    eval_sh(deg, sh, dirs) -> colors

where ``sh`` has the basis dimension *last* (the reference transposes its
(N, n_basis, 3) color tensor to (..., 3, n_basis) before calling) and ``dirs``
are unit view directions, shape broadcastable to sh[..., 0] per component.

Everything here is elementwise VPU work that XLA fuses into the surrounding
projection pipeline; no kernel needed.
"""

import jax.numpy as jnp

# Real SH constants (standard normalization used across 3DGS implementations).
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_bases(deg: int) -> int:
    return (deg + 1) ** 2


def eval_sh_packed(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """eval_sh for 2-D packed coefficients (..., B * C), basis-major.

    Identical math to :func:`eval_sh`, consuming the flattened layout
    ``sh3d.reshape(..., B * C)`` directly. Why it exists: a materialized
    (N, B, 3) f32 tensor pads its minor dims to the TPU's (8, 128) tile —
    42-76x memory (observed 3 x 4.3 GB optax temps at the 1M-gaussian bench) —
    so the SH leaf stays 2-D end-to-end inside jit and no 3-D tensor ever
    appears in the graph.

    Args:
      deg: SH degree in [0, 3].
      sh: (..., B * C) coefficients, C channels minor within each basis.
      dirs: (..., 3) unit directions, broadcastable against sh[..., :C].

    Returns (..., C) colors.
    """
    assert 0 <= deg <= 3
    C = 3

    def coef(b):
        return sh[..., b * C:(b + 1) * C]

    result = _C0 * coef(0)
    if deg >= 1:
        xx = dirs[..., 0:1]
        yy = dirs[..., 1:2]
        zz = dirs[..., 2:3]
        result = result - _C1 * yy * coef(1) + _C1 * zz * coef(2) - _C1 * xx * coef(3)
        if deg >= 2:
            xy, yz, xz = xx * yy, yy * zz, xx * zz
            x2, y2, z2 = xx * xx, yy * yy, zz * zz
            result = (
                result
                + _C2[0] * xy * coef(4)
                + _C2[1] * yz * coef(5)
                + _C2[2] * (2.0 * z2 - x2 - y2) * coef(6)
                + _C2[3] * xz * coef(7)
                + _C2[4] * (x2 - y2) * coef(8)
            )
            if deg >= 3:
                result = (
                    result
                    + _C3[0] * yy * (3.0 * x2 - y2) * coef(9)
                    + _C3[1] * xy * zz * coef(10)
                    + _C3[2] * yy * (4.0 * z2 - x2 - y2) * coef(11)
                    + _C3[3] * zz * (2.0 * z2 - 3.0 * x2 - 3.0 * y2) * coef(12)
                    + _C3[4] * xx * (4.0 * z2 - x2 - y2) * coef(13)
                    + _C3[5] * zz * (x2 - y2) * coef(14)
                    + _C3[6] * xx * (x2 - 3.0 * y2) * coef(15)
                )
    return result


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH colors.

    Args:
      deg: SH degree in [0, 3] (reference default L_max=2, gs_model.py:139).
      sh: (..., C, (deg+1)**2) coefficients, basis last.
      dirs: (..., 3) unit directions, broadcastable against sh[..., 0].

    Returns:
      (..., C) colors (no sigmoid / offset — the reference composites the raw
      SH radiance, initialized with c00=1.77 so base color ~0.5/C0).
    """
    assert 0 <= deg <= 3
    result = _C0 * sh[..., 0]
    if deg >= 1:
        # sh is (..., C, B); dirs components get a trailing singleton so they
        # broadcast over the channel axis C.
        xx = dirs[..., 0][..., None]
        yy = dirs[..., 1][..., None]
        zz = dirs[..., 2][..., None]
        result = (
            _C0 * sh[..., 0]
            - _C1 * yy * sh[..., 1]
            + _C1 * zz * sh[..., 2]
            - _C1 * xx * sh[..., 3]
        )
        if deg >= 2:
            xy, yz, xz = xx * yy, yy * zz, xx * zz
            x2, y2, z2 = xx * xx, yy * yy, zz * zz
            result = (
                result
                + _C2[0] * xy * sh[..., 4]
                + _C2[1] * yz * sh[..., 5]
                + _C2[2] * (2.0 * z2 - x2 - y2) * sh[..., 6]
                + _C2[3] * xz * sh[..., 7]
                + _C2[4] * (x2 - y2) * sh[..., 8]
            )
            if deg >= 3:
                result = (
                    result
                    + _C3[0] * yy * (3.0 * x2 - y2) * sh[..., 9]
                    + _C3[1] * xy * zz * sh[..., 10]
                    + _C3[2] * yy * (4.0 * z2 - x2 - y2) * sh[..., 11]
                    + _C3[3] * zz * (2.0 * z2 - 3.0 * x2 - 3.0 * y2) * sh[..., 12]
                    + _C3[4] * xx * (4.0 * z2 - x2 - y2) * sh[..., 13]
                    + _C3[5] * zz * (x2 - y2) * sh[..., 14]
                    + _C3[6] * xx * (x2 - 3.0 * y2) * sh[..., 15]
                )
    return result
