"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled, so results can be compared against NumPy references at
tight tolerances and multi-device sharding is exercised without TPU pods.

NOTE: in this environment the JAX_PLATFORMS env var is not honored (an
'axon' TPU-tunnel plugin grabs the platform), so the platform is forced via
jax.config, which must happen before any computation."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# The suite is dominated by XLA:CPU compile time (every test jits fresh
# programs); dialing back backend optimization cuts wall time ~2.5x without
# changing results (tests compare against NumPy at tight tolerances).
jax.config.update("jax_disable_most_optimizations", True)

import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite jits hundreds of unique programs; XLA:CPU keeps every
    executable alive and at ~240 accumulated programs its compiler
    segfaults (reproducibly at the same collection index, exit 139 —
    resource exhaustion, not a test bug: the same modules pass in any
    smaller grouping). Per-module cache clearing caps the growth; programs
    are rarely shared across modules, so the recompile cost is noise."""
    yield
    jax.clear_caches()
    gc.collect()
