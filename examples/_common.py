"""Shared example bootstrap: import path + float64 CPU by default.

Examples are demonstrations of the API, not perf runs: they default to
float64 on CPU (set EX_TPU=1 to run on the accelerator in its native
float32 — expect iterative-solver tolerances to floor near 1e-7)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

if not int(os.environ.get("EX_TPU", "0")):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
