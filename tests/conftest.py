"""Test harness: force the CPU backend with 8 virtual devices.

The axon TPU plugin registers itself regardless of JAX_PLATFORMS, so tests
pin the default device to CPU explicitly; sharding tests build their mesh
from ``jax.devices('cpu')``.

TPU lane: ``HYDROLIM_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py``
leaves the default device on the TPU so the Pallas/Mosaic tests (which have
no CPU interpreter path) actually run.  The verify skill runs this lane each
round; without it those tests always skip under the CPU-pinned default run.
"""
import os

TPU_LANE = os.environ.get("HYDROLIM_TPU_TESTS", "") == "1"

if not TPU_LANE:
    # APPEND to any existing XLA_FLAGS (setdefault would silently drop the
    # 8-virtual-device flag when e.g. --xla_dump_to is set, and every
    # sharding test would then skip while the suite still reports green)
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    # The persistent compilation cache exists for Mosaic/TPU tunnel
    # compiles; on some hosts SERIALIZING XLA:CPU executables for the
    # cache write segfaults intermittently (observed mid-suite in
    # compilation_cache.put_executable_and_time on the round-4 host), so
    # the CPU suite must never engage it.  Set BEFORE hydrolim_tpu import.
    os.environ.setdefault("HYDROLIM_NO_COMPILATION_CACHE", "1")

import jax  # noqa: E402
import pytest  # noqa: E402

if not TPU_LANE:
    # Belt and braces: the axon plugin overrides the JAX_PLATFORMS env var,
    # and when its remote worker is down ANY backend init — even
    # jax.devices('cpu') — blocks indefinitely, hanging the whole
    # CPU-pinned suite at the session fixture with zero CPU load.  The
    # config update (unlike the env var) reliably restricts initialization
    # to the CPU backend, so the suite runs regardless of worker health.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # older jax or already-initialized backends: keep going


@pytest.fixture(scope="session", autouse=True)
def _force_cpu():
    if TPU_LANE:
        yield
        return
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        yield
        return
    jax.config.update("jax_default_device", cpu)
    yield


def cpu_devices():
    return jax.devices("cpu")
