"""PLY export/import in the official-3DGS interchange layout.

The reference checkpoints raw ``torch.save`` tensors (gs_control.py:226-231
— covered by train/checkpoint.save_reference_pt); it has no PLY path. The
wider 3DGS ecosystem (SIBR viewer, web splat viewers, editors) exchanges
models as binary PLY with the INRIA attribute layout instead, so a model
trained here can be dropped into any standard viewer:

    x y z nx ny nz                         float32 (normals written as zero)
    f_dc_0..2                              DC SH coefficient per channel
    f_rest_0..(3*(B-1)-1)                  higher SH, CHANNEL-major
    opacity                                logit (pre-sigmoid)
    scale_0..2                             log-scale
    rot_0..3                               quaternion, w first

Two representation conversions (lossless, inverted on load):

* **SH DC offset.** This framework composites raw SH radiance with no +0.5
  offset, matching the reference (gs_model.py:335-338 feeds eval_sh output
  straight into compositing; ops/sh.eval_sh docstring). Official viewers
  compute ``0.5 + C0 * f_dc + (higher terms)``, so the DC coefficient is
  shifted by -0.5/C0 on export (+0.5/C0 on import). Higher-order bands carry
  no offset and map directly, modulo the basis/channel transpose.
* **Quaternion order.** Model storage is xyzw (the reference's
  ``variance_q`` convention, gs_control.py:113-114); PLY rot_* is w-first.

No third-party PLY library: the header is a fixed template and the body is
one numpy structured array.
"""

import numpy as np

from simplegaussiansplat_tk71_tpu.models.gaussians import (
    GaussianModel,
    round_capacity,
)
from simplegaussiansplat_tk71_tpu.ops.sh import num_sh_bases

_C0 = 0.28209479177387814
_DC_OFFSET = 0.5 / _C0  # viewer color = 0.5 + C0 * f_dc  <=>  c00 = f_dc + 0.5/C0


def _property_names(n_bases: int) -> list:
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(3 * (n_bases - 1))]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    return names


def save_ply(path: str, model: GaussianModel) -> int:
    """Write alive rows as official-3DGS binary PLY; returns the row count."""
    alive = np.asarray(model.alive).astype(bool)
    n = int(alive.sum())
    nb = num_sh_bases(model.sh_degree)

    def rows(x):  # component-major (C, cap) -> (n, C)
        return np.ascontiguousarray(np.asarray(x).T[alive])

    xyz = rows(model.mean)
    # packed SH rows are basis-major (row b*3+c): (n, nb, 3)
    sh = rows(model.sh).reshape(n, nb, 3)
    f_dc = sh[:, 0, :] - _DC_OFFSET
    # f_rest is channel-major: (n, nb-1, 3) -> (n, 3, nb-1) -> flat
    f_rest = np.transpose(sh[:, 1:, :], (0, 2, 1)).reshape(n, -1)
    opacity = np.asarray(model.logit_opacity)[alive].reshape(n, 1)
    scale = rows(model.log_scale)
    quat = rows(model.quat)  # xyzw -> wxyz
    rot = np.concatenate([quat[:, 3:4], quat[:, 0:3]], axis=1)

    names = _property_names(nb)
    out = np.zeros(n, dtype=[(p, "<f4") for p in names])
    cols = np.concatenate(
        [xyz, np.zeros((n, 3), np.float32), f_dc, f_rest, opacity, scale, rot],
        axis=1,
    ).astype(np.float32)
    for i, p in enumerate(names):
        out[p] = cols[:, i]

    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        + "".join(f"property float {p}\n" for p in names)
        + "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(out.tobytes())
    return n


def load_ply(path: str, capacity: int = None) -> GaussianModel:
    """Read an official-3DGS PLY (ours or a third-party tool's) into a
    capacity-padded component-major GaussianModel."""
    import jax.numpy as jnp

    with open(path, "rb") as f:
        props = []
        n = None
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property"):
                kind, name = line.split()[1:]
                if kind != "float":
                    raise ValueError(f"unsupported property type {kind}")
                props.append(name)
            elif line == "end_header":
                break
            elif line == "" and n is None:
                raise ValueError("not a PLY file")
        data = np.frombuffer(
            f.read(n * 4 * len(props)), dtype=[(p, "<f4") for p in props]
        )

    n_rest = sum(1 for p in props for _ in [0] if p.startswith("f_rest_"))
    nb = n_rest // 3 + 1
    deg = int(round(np.sqrt(nb))) - 1
    if num_sh_bases(deg) != nb:
        raise ValueError(f"f_rest count {n_rest} is not a full SH band set")

    def cols(names):
        return np.stack([data[p] for p in names], axis=1).astype(np.float32)

    xyz = cols(["x", "y", "z"])
    f_dc = cols([f"f_dc_{i}" for i in range(3)]) + _DC_OFFSET
    sh = np.zeros((n, nb, 3), np.float32)
    sh[:, 0, :] = f_dc
    if nb > 1:
        rest = cols([f"f_rest_{i}" for i in range(n_rest)])
        sh[:, 1:, :] = np.transpose(
            rest.reshape(n, 3, nb - 1), (0, 2, 1)
        )
    opacity = data["opacity"].astype(np.float32)
    scale = cols(["scale_0", "scale_1", "scale_2"])
    rot = cols(["rot_0", "rot_1", "rot_2", "rot_3"])  # wxyz -> xyzw
    quat = np.concatenate([rot[:, 1:4], rot[:, 0:1]], axis=1)

    cap = capacity or round_capacity(n)

    def pack(x):  # (n, C) -> component-major (C, cap)
        out = np.zeros((cap, x.shape[1]), np.float32)
        out[:n] = x
        return jnp.asarray(np.ascontiguousarray(out.T))

    op = np.zeros((cap,), np.float32)
    op[:n] = opacity
    alive = np.zeros((cap,), bool)
    alive[:n] = True
    return GaussianModel(
        mean=pack(xyz),
        quat=pack(quat),
        log_scale=pack(scale),
        logit_opacity=jnp.asarray(op),
        sh=pack(sh.reshape(n, nb * 3)),
        alive=jnp.asarray(alive),
    )
