"""Test harness: run everything on an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
`--xla_force_host_platform_device_count=8` fake devices (SURVEY.md §4's new
multi-device test obligation). Pallas kernels run in interpreter mode on CPU
(config.pallas_interpret() is automatic).

Note: jax may already be imported by a pytest plugin before this conftest
runs, so env vars alone are too late; the backend initializes lazily, so
`jax.config.update` still takes effect here.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running tests")
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.default_backend())
    assert jax.device_count() == 8, jax.devices()
