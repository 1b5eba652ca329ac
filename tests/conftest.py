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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
