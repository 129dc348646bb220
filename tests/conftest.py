"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The reference (liuQuan98/APR) has no automated tests at all (SURVEY.md §4); we
build the test pyramid ourselves. CI needs no TPU: jax-on-CPU is the "fake
backend", and multi-chip sharding is exercised with
``--xla_force_host_platform_device_count=8``.

This module must run before anything imports jax, hence env mutation at the
top of conftest (pytest imports conftest before collecting test modules).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = _flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU tunnel overrides JAX_PLATFORMS; force CPU via config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def jax_key():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True, scope="module")
def _free_compiled_programs():
    """Drop jit/lowering caches after each test module.

    A full-suite run compiles hundreds of XLA CPU programs; the accumulated
    RSS reproducibly segfaulted the CPU compiler inside the largest
    late-suite compile (test_symmetric).  Freeing executables between
    modules keeps the process flat; per-module recompiles are already paid
    since jitted closures differ per module.
    """
    yield
    jax.clear_caches()
    import gc

    gc.collect()
