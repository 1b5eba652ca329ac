"""Test configuration: run on CPU with 8 virtual devices and f64 enabled.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware available in CI); numerical parity tests use float64 to match the
reference's double-precision kernels.
"""
import os

# NOTE: the environment's sitecustomize forces JAX_PLATFORMS=axon (the TPU
# tunnel); jax.config takes precedence, so use that to pin tests to CPU.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Work around a deterministic XLA:CPU JIT segfault when one process
    accumulates the whole suite's compiled programs: after the module
    sequence assoc..gaits (incl. fast_paths), the *compile* of the
    swing-constraint solve in test_model_api crashes inside
    backend_compile_and_load (jaxlib 0.9.0; 125 GB RAM free — not OOM;
    the same program compiles fine in a fresh process). Dropping the
    executable caches between modules keeps per-process compiled-code
    volume bounded and avoids the crash; cross-module programs recompile."""
    yield
    jax.clear_caches()
