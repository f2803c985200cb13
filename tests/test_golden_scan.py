"""Port of the reference's golden kernel test (cuda_test.py:19-34).

The reference validates its CUDA segmented cumprod forward + backward on a
hand-checked 5-element case: param (.4,.2,.1,.8,.2), groups (0,0,1,1,2),
expected backward grads (0.44, 0.08, 0.74, 0.08, 0.2) for
grad_in[i] = sum_{j>=i, same group} grad[j]*cumprod[j]/param[i]
(grouped_cumprod_backward.cu:9-65). Here the same case runs through our
dense-layout Hillis-Steele scans (ops/rasterize_pallas) in interpreter mode:
groups become pixel columns, the scan axis is depth.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simplegaussiansplat_tk71_tpu.ops.rasterize_pallas import (
    _inclusive_cumsum,
    _exclusive_cumprod,
    _scan_shift,
)


def _run_in_kernel(fn, *arrays):
    """Run fn(*vmem blocks) -> block inside a 1-program pallas_call
    (pltpu.roll has no evaluation rule outside kernel tracing)."""

    def kernel(*refs):
        out_ref = refs[-1]
        out_ref[:, :] = fn(*[r[:, :] for r in refs[:-1]])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(arrays[0].shape, arrays[0].dtype),
        interpret=True,
    )(*arrays)


def _dense_case():
    # groups (0,0) (1,1) (2,) -> columns; depth axis rows; pad K=8, P=128
    K, P = 8, 128
    vals = np.ones((K, P), np.float32)
    vals[0, 0], vals[1, 0] = 0.4, 0.2
    vals[0, 1], vals[1, 1] = 0.1, 0.8
    vals[0, 2] = 0.2
    grad = np.zeros((K, P), np.float32)
    grad[:2, :3] = vals[:2, :3]
    grad[1, 2] = 0.0  # group 2 has one element
    return jnp.asarray(vals), jnp.asarray(grad)


def test_golden_segmented_cumprod_forward():
    vals, _ = _dense_case()
    excl = _run_in_kernel(_exclusive_cumprod, vals)
    incl = np.asarray(excl) * np.asarray(vals)
    np.testing.assert_allclose(incl[0, :3], [0.4, 0.1, 0.2], rtol=1e-6)
    np.testing.assert_allclose(incl[1, :3], [0.08, 0.08, 0.2], rtol=1e-6)


def test_golden_segmented_cumprod_backward():
    vals, grad = _dense_case()

    def bwd(vals, grad):
        excl = _exclusive_cumprod(vals)
        incl = excl * vals
        prod = grad * incl
        # inclusive suffix sum along depth = total - exclusive-prefix
        csum = _inclusive_cumsum(prod)
        total = csum[-1:, :]
        return total - csum + prod

    suffix_incl = _run_in_kernel(bwd, vals, grad)
    out = np.asarray(suffix_incl) / np.asarray(vals)
    got = [out[0, 0], out[1, 0], out[0, 1], out[1, 1], out[0, 2]]
    np.testing.assert_allclose(got, [0.44, 0.08, 0.74, 0.08, 0.2], rtol=1e-5)


def test_scan_shift_semantics():
    x = jnp.arange(8, dtype=jnp.float32)[:, None] * jnp.ones((8, 128))
    y = np.asarray(_run_in_kernel(lambda a: _scan_shift(a, 3, -1.0), x))
    assert (y[:3] == -1.0).all()
    np.testing.assert_allclose(y[3:, 0], np.arange(5))
