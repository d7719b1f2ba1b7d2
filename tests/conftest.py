"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests use
xla_force_host_platform_device_count per SURVEY.md §4 (test strategy).
Must set env before jax is imported anywhere.
"""

import os

# the axon TPU tunnel registers itself from sitecustomize when
# PALLAS_AXON_POOL_IPS is set and overrides JAX_PLATFORMS; tests always run
# on the virtual CPU mesh
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon baked in; override the already-loaded config too
# (backends are not initialised until first use, so this is still in time)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
