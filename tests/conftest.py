"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring how the
driver dry-runs the multi-chip path.

Note: the TPU host environment registers its PJRT plugin from sitecustomize,
which imports jax before any test code runs — so the env-var JAX_PLATFORMS
is already frozen. jax.config.update('jax_platforms', ...) still works after
import, and XLA_FLAGS is read lazily at first CPU-client creation.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_jax_caches():
    """Work around a JAX executable-cache consistency bug observed when
    distinct jitted wrappers over equal callables trace scenes that differ
    only in unused arrays: the cached executable's buffer count mismatches
    ("Execution supplied N buffers but compiled program expected M").
    Clearing caches between tests keeps every test hermetic."""
    yield
    import jax

    jax.clear_caches()
