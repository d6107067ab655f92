"""Benchmark: SpMV throughput (nnz/s/chip) vs HBM roofline.

Operational metric from BASELINE.md: SpMV >= 70% of per-chip HBM roofline.
The operator is the assembled Q2 Poisson stiffness matrix on a large 2-D
quad mesh in ELL layout (the framework's device format); SpMV traffic is
8 B/nnz (f32 value + i32 column) plus the x-gather and y-write, so the
roofline is BW / 8 nnz/s and the baseline is 70% of that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

HBM_BW = {  # bytes/s per chip (public specs)
    "v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9, "v4": 1228e9,
    "v6e": 1640e9, "cpu": 50e9,
}


def chip_bw():
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for k, v in HBM_BW.items():
        if k in kind:
            return v
    return 819e9


def build_operator(n=512):
    """Assembled Q2 Poisson ELL operator on an n x n quad mesh (on device)."""
    from femus_tpu.assembly.bc import generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.mesh.generation import unit_box

    mesh = unit_box((n, n), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth",
                    dtype=jnp.float32)
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
    tables = asm.device_tables()
    u0 = jnp.zeros(asm.n_dofs_pad, jnp.float32)
    R, data = assemble(u0, tables)
    A = asm.op_with(data)
    nnz = asm.pattern.nnz
    return A, nnz


def bench_spmv(A, iters=50):
    @jax.jit
    def sweep(x):
        def body(v, _):
            return A @ v, None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    x = jnp.ones(A.n_rows, jnp.float32)
    sweep(x).block_until_ready()          # compile + warm
    t0 = time.perf_counter()
    sweep(x).block_until_ready()
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    n = int(os.environ.get("BENCH_N", "512"))
    A, nnz = build_operator(n)
    t_iter = bench_spmv(A)
    nnz_per_s = nnz / t_iter
    roofline = chip_bw() / 8.0            # 8 B/nnz value+index traffic
    baseline = 0.7 * roofline
    print(json.dumps({
        "metric": "spmv_nnz_per_s_per_chip",
        "value": round(nnz_per_s / 1e9, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(nnz_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
