"""Test fixture: run on a virtual 8-device CPU mesh with float64 enabled.

Multi-chip hardware is not available in CI; sharding is validated on a
host-platform device mesh (XLA_FLAGS=--xla_force_host_platform_device_count).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: this environment registers an experimental TPU platform that wins
# over the JAX_PLATFORMS env var; jax.config is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
