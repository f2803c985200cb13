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
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long end-to-end runs (full quality-run smoke etc.)"
    )
