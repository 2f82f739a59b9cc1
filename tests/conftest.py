"""Test configuration: run on CPU with 8 virtual devices and float64.

The real TPU chip is reserved for benchmarks; unit tests exercise the same
XLA programs on the CPU backend (numerics in float64, matching the
reference's double-precision end-to-end), and multi-chip sharding tests use
the 8-device virtual CPU mesh.
"""

import os

# The harness pre-sets JAX_PLATFORMS=axon,cpu (the TPU tunnel).  jax may
# already be imported by pytest plugin autoload, so setting the env var here
# is not enough — use jax.config.update, which works any time before backend
# initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound in-process compiled-executable accumulation.

    Running the full suite in one process accumulates hundreds of
    XLA:CPU (LLVM JIT) executables and eventually segfaults inside
    backend_compile_and_load (observed deterministically around test 215
    of the full run; any half of the suite passes in isolation).
    Dropping the compilation caches between test modules keeps the JIT
    code cache bounded; modules re-compile what they share, which costs
    ~20% wall time and removes the crash.
    """
    yield
    jax.clear_caches()
