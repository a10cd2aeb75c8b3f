"""Test configuration: force CPU with 8 virtual devices (to validate
multi-chip sharding without TPU hardware) and enable x64 for parity with the
reference's Float64 numerics (SURVEY.md §4 test strategy).

NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var, so we force the
platform through jax.config before any computation runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# Bound in-process XLA compile-cache growth: a single pytest process
# accumulates every jitted executable across ~125 tests and the XLA CPU
# client reproducibly segfaulted inside backend_compile around test ~108
# (LLVM-side, not a library bug — each file passes in isolation). Clearing
# JAX's jit caches between test modules keeps the process bounded; the
# next module re-traces what it needs.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_cache():
    yield
    jax.clear_caches()
