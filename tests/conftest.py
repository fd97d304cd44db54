"""Test harness config: run everything on a virtual 8-device CPU mesh so the
suite is hermetic (no TPU dependency) and multi-chip sharding paths execute.

The container boots with an `axon` TPU PJRT plugin whose sitecustomize calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, so
overriding the env var is not enough — we must override the jax config value
itself (backends bind lazily, so doing it here is early enough).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# persistent compile cache: this host has 2 vCPUs; re-runs should not pay
# XLA compile time again.
# CAUTION: do not run two pytest processes concurrently against this dir —
# concurrent writers can corrupt an entry, and jax's cache READ then
# segfaults the process (observed 2026-08-21; `rm -rf tests/.jax_cache`
# recovers).
cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU, got " + jax.devices()[0].platform
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
