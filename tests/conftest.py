"""Test harness: force the CPU backend with 8 virtual devices.

The container boot registers the axon TPU plugin via sitecustomize before any
test code runs, so JAX_PLATFORMS in the environment is not enough — the backend
must be overridden through jax.config before first device use.  8 virtual CPU
devices are JAX's standard fake-multi-device mechanism for testing mesh
sharding (SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# M3P_TPU_TESTS=1 leaves the real backend in place so the @tpu_only kernel
# tests (hardware-PRNG dropout, fused kernels) run on-chip; default is the
# CPU 8-device virtual mesh.  NOTE: only one TPU process at a time.
if os.environ.get("M3P_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) == 8, devices
    return devices


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (multi-process CLI)")
