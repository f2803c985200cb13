"""Multi-host initialization and deterministic cross-host behavior.

The reference has no distributed layer at all (SURVEY.md section 2b). For
pod-slice training (v5e-16 and beyond = 2+ hosts), the recipe is:

  1. jax.distributed.initialize() on every host (env-driven coordinator);
  2. build one global mesh over all devices; shard cameras over it — each
     host feeds only its local shard of every batch (make_local_batch);
  3. parameters replicated; gradient psum rides ICI within a host and DCN
     across hosts (XLA inserts the hierarchy automatically for a 1-D mesh);
  4. densify must be deterministic across hosts: all hosts hold identical
     replicated parameters and stats, and run the SAME numpy RNG seeded from
     the step counter (densify_rng), so every host computes identical splits
     without communication.

Single-host runs work unchanged (initialize() is skipped when no coordinator
is configured).
"""

import os

import numpy as np

import jax


def maybe_initialize_distributed() -> bool:
    """jax.distributed.initialize() when a coordinator is configured
    (JAX_COORDINATOR_ADDRESS or cloud-TPU autodetection). Returns True if
    multi-process.

    Order matters: anything that touches the XLA backend (jax.devices,
    jax.process_count, any computation) before initialize() poisons it —
    so the coordinator env is consulted FIRST and process_count only as the
    already-initialized fallback (tests/_multihost_worker.py exercises this
    on a real 2-process CPU backend)."""
    if jax.distributed.is_initialized():
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
        return True
    return jax.process_count() > 1


def global_mesh(axis_name: str = "data"):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def local_batch_slice(global_batch: int) -> slice:
    """The camera-index slice this host feeds (equal shards per host)."""
    per_host = global_batch // jax.process_count()
    lo = jax.process_index() * per_host
    return slice(lo, lo + per_host)


def densify_rng(step: int, seed: int = 0) -> np.random.Generator:
    """Host-independent RNG for densify split sampling: identical streams on
    every host => identical parameter edits without communication."""
    return np.random.default_rng(np.random.SeedSequence([seed, step]))
