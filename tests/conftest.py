"""Test harness: force the CPU backend with 8 virtual devices.

The axon TPU plugin registers itself regardless of JAX_PLATFORMS, so tests
pin the default device to CPU explicitly; sharding tests build their mesh
from ``jax.devices('cpu')``.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _force_cpu():
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        yield
        return
    jax.config.update("jax_default_device", cpu)
    yield


def cpu_devices():
    return jax.devices("cpu")
