"""Checkpoint save/load.

Unlike the reference — which torch.saves only the five parameter tensors with
no optimizer state, step counter, or any loading code (gs_control.py:226-231;
SURVEY.md section 5) — checkpoints here capture the full training state:
parameters + alive mask, optimizer state, densify stats, and the step.

Format: a single .npz of flattened pytree leaves keyed by path (portable,
no pickle of custom classes), plus loaders for the reference's torch ``.pt``
artifacts (mean.pt / opacity.pt / ...) for parity-config initialization.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from simplegaussiansplat_tk71_tpu.adaptive.densify import DensifyStats
from simplegaussiansplat_tk71_tpu.models.gaussians import GaussianModel


def _flatten(prefix, tree, out):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = prefix + "".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(
    path: str, model: GaussianModel, opt_state, stats, step: int,
    extra: dict | None = None,
):
    """extra: optional scalar run state (e.g. an adapted max_per_tile) saved
    as ``extra.<key>`` entries; Trainer.restore re-applies what it knows."""
    arrays = {}
    _flatten("model", model, arrays)
    _flatten("opt", opt_state, arrays)
    _flatten("stats", stats, arrays)
    arrays["step"] = np.asarray(step)
    for k, v in (extra or {}).items():
        arrays[f"extra.{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_checkpoint(path: str, model_like: GaussianModel, opt_state_like, stats_like):
    """Restore into the same pytree structure (shapes must match)."""
    data = np.load(path)

    def restore(prefix, tree):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        new_leaves = []
        for pathkey, leaf in leaves:
            key = prefix + "".join(str(p) for p in pathkey)
            arr = data[key]
            new_leaves.append(jnp.asarray(arr))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    model = restore("model", model_like)
    opt_state = restore("opt", opt_state_like)
    stats = restore("stats", stats_like)
    step = int(data["step"])
    return model, opt_state, stats, step


def latest_checkpoint(directory: str) -> str | None:
    """Path of the newest ckpt_<step>.npz in directory, or None.

    Failure-recovery story: the reference restarts training from scratch on
    any exception (gs_control.py:241-244); here a crashed run resumes from
    the last periodic checkpoint (Trainer writes every checkpoint_every)."""
    import glob
    import re

    best, best_step = None, -1
    for p in glob.glob(os.path.join(directory, "ckpt_*.npz")):
        m = re.search(r"ckpt_(\d+)\.npz$", p)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best


def save_reference_pt(directory: str, model: GaussianModel):
    """Export the five raw parameter tensors in the reference's checkpoint
    format (torch.save of mean.pt / variance_q.pt / variance_scale.pt /
    opacity.pt / color.pt — gs_control.py:226-231), so reference tooling can
    consume a model trained here. Only alive rows are written (the reference
    has no capacity padding). Round-trips through load_reference_pt."""
    import torch

    os.makedirs(directory, exist_ok=True)
    alive = np.asarray(model.alive)
    n = int(alive.sum())
    # capacity padding keeps alive rows a prefix (densify compaction), but
    # select defensively by mask anyway
    def rows(x):  # component-major (C, cap) -> (n, C)
        return np.ascontiguousarray(np.asarray(x).T[alive])

    nb = (model.sh_degree + 1) ** 2
    tensors = {
        "mean.pt": rows(model.mean),
        "variance_q.pt": rows(model.quat),
        "variance_scale.pt": rows(model.log_scale),
        "opacity.pt": np.asarray(model.logit_opacity)[alive].reshape(n, 1),
        "color.pt": rows(model.sh).reshape(n, nb, 3),
    }
    for name, arr in tensors.items():
        torch.save(
            torch.from_numpy(np.ascontiguousarray(arr)),
            os.path.join(directory, name),
        )


def load_reference_pt(directory: str, sh_degree: int = 2):
    """Load the reference's raw torch.save parameter files into a
    GaussianModel (mean.pt, variance_q.pt, variance_scale.pt, opacity.pt,
    color.pt — save code gs_control.py:226-231). Requires torch (cpu)."""
    import torch

    def get(name):
        t = torch.load(
            os.path.join(directory, name), map_location="cpu", weights_only=False
        )
        return np.asarray(t.detach().to(torch.float32).numpy())

    mean = get("mean.pt")
    quat = get("variance_q.pt")
    log_scale = get("variance_scale.pt")
    logit_op = get("opacity.pt")
    sh = get("color.pt")  # (N, B, 3) -> packed rows (B*3, N)
    sh = sh.reshape(sh.shape[0], -1)
    from simplegaussiansplat_tk71_tpu.models.gaussians import round_capacity

    n = mean.shape[0]
    cap = round_capacity(n)

    def pack_t(x, fill=0.0):
        # component-major storage (models/gaussians docstring)
        out = np.full((cap, x.shape[1]), fill, np.float32)
        out[:n] = x
        return jnp.asarray(np.ascontiguousarray(out.T))

    logit_flat = np.zeros((cap,), np.float32)
    logit_flat[:n] = logit_op.reshape(-1)
    return GaussianModel(
        mean=pack_t(mean),
        quat=pack_t(quat),
        log_scale=pack_t(log_scale, -10.0),
        logit_opacity=jnp.asarray(logit_flat),
        sh=pack_t(sh),
        alive=jnp.asarray(np.arange(cap) < n),
    )
