"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md section 4:
multi-host logic is tested single-host via xla_force_host_platform_device_count).
"""

import os

# Force-override: the container exports JAX_PLATFORMS=axon (the tunneled TPU);
# unit tests must run on the virtual CPU mesh. Also drop the axon pool var —
# with it set, sitecustomize registers the TPU client in every pytest process
# and the suite silently contends for the (possibly busy) chip.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
# The env vars above are read at jax IMPORT — but the container's
# sitecustomize (/root/.axon_site) imports jax at interpreter start, long
# before this conftest, so with PALLAS_AXON_POOL_IPS set at launch the axon
# TPU plugin is already registered and the env edits alone do nothing. Any
# test that then enumerates backends CLAIMS the tunneled TPU chip — and if
# another process holds the claim, the whole suite silently sleeps (round-4:
# a 45-min pytest run made 5 dots while a quality run trained). Forcing the
# platform through jax.config works even after import, as long as no backend
# has been initialized yet — which holds at conftest time.
import sys

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache (VERDICT round-3 next #7: the suite was
# compile-bound — trainer-loop tests jit 3-6 step graphs each as densify
# grows capacity/K; ~38 min contended, ~16 min alone). Cache keys include
# backend + HLO hash, so CPU test graphs coexist with the TPU bench cache;
# a warm suite run replays compiles from disk. The dir is gitignored.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2.0")
# Virtual-device CPU collectives are single-host timeshared: plenty of RAM,
# so let two pytest-xdist workers overlap compiles (`pytest -n 2`).


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long end-to-end runs (full quality-run smoke etc.)"
    )
