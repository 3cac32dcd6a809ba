"""Test fixture: run on a virtual 8-device CPU mesh with float64 enabled.

Multi-chip hardware is not available in CI; sharding is validated on a
host-platform device mesh (XLA_FLAGS=--xla_force_host_platform_device_count).

Compile-cost control (the suite is XLA-CPU-compile-bound on this 1-core
host: a clamped EB deck measured 476 s compile vs 3.4 s run):
  * --xla_backend_optimization_level=0 -- ~1.5x faster compiles; tests
    assert physics tolerances, never optimization-dependent timings.
  * persistent compilation cache -- re-runs of unchanged programs load
    instead of recompiling (measured 51 s -> 17 s on the TGV advance).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# NOTE: this environment registers an experimental TPU platform that wins
# over the JAX_PLATFORMS env var; jax.config is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("INCFLO_JAX_CACHE_CPU",
                   os.path.expanduser("~/.cache/incflo_tpu_xla_cpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
