"""k-nearest-neighbor mean distance for scale initialization.

Reference: Utilities.kyori2 (uitility.py:68-78) — batched cdist over 2000-row
chunks, sort, mean of the first k columns. NOTE the reference's k columns
*include the self-distance 0* (the sort puts the point's own zero first), so
its "mean 3-NN distance" is really mean(0, d1, d2). We reproduce that by
default (include_self=True) for init parity; include_self=False gives the
true k-NN mean.
"""

import jax
import jax.numpy as jnp
import numpy as np


def knn_mean_dist(
    xyz: np.ndarray, k: int = 3, include_self: bool = True, chunk: int = 512
) -> np.ndarray:
    """(N, 3) points -> (N,) mean distance to the k nearest neighbors."""
    pts = jnp.asarray(xyz, dtype=jnp.float32)
    n = pts.shape[0]
    kk = k if include_self else k + 1
    kk = min(kk, n)
    pad = (-n) % chunk
    padded = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=1e9)

    def body(block):
        d2 = jnp.sum(jnp.square(block[:, None, :] - pts[None, :, :]), axis=-1)
        neg_small, _ = jax.lax.top_k(-d2, kk)
        d = jnp.sqrt(jnp.maximum(-neg_small, 0.0))
        if include_self:
            return jnp.mean(d, axis=1)
        return jnp.mean(d[:, 1:], axis=1)

    blocks = padded.reshape(-1, chunk, 3)
    out = jax.lax.map(body, blocks).reshape(-1)[:n]
    return np.asarray(out)
