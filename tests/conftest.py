"""Test configuration: run JAX on a virtual 8-device CPU mesh in float64.

This is the no-cluster distributed-test backend (SURVEY.md §4): multi-chip
sharding logic is exercised on host CPU devices; numerical accuracy tests use
x64.  Real-TPU runs (bench.py) use float32 and are not affected.

Note: the environment pre-registers a TPU backend via sitecustomize before
pytest imports this file, so setting JAX_PLATFORMS in os.environ is too late —
we must force the platform through jax.config.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the quick gate is compile-dominated on CPU
# (hundreds of distinct jitted solve graphs); repeat runs hit the cache
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
