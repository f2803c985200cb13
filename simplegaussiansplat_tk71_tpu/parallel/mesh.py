"""Device mesh setup.

The reference is strictly single-process single-GPU (SURVEY.md section 2b) —
this layer is new capability. The mesh exposes one ``data`` axis used to shard
cameras (and their tile workloads) across chips; Gaussian parameters are
replicated and their gradients all-reduced with psum over ICI.
"""

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))
