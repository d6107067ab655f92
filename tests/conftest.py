"""Test configuration: run JAX on a virtual 8-device CPU mesh in float64.

This is the no-cluster distributed-test backend (SURVEY.md §4): multi-chip
sharding logic is exercised on host CPU devices; numerical accuracy tests use
x64.  Real-TPU runs (bench.py) use float32 and are not affected.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
