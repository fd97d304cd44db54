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
# XLA compile time again. compile_cache gives each process a private
# hardlink-seeded mirror with atomic publish-on-exit, so concurrent pytest
# runs or a killed run can never corrupt an entry another process reads
# (a corrupt entry segfaults jax's cache read — observed 2026-08-21).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mloam_tpu.utils import compile_cache  # noqa: E402

compile_cache.setup(os.path.join(os.path.dirname(__file__), ".jax_cache"))


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU, got " + jax.devices()[0].platform
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
