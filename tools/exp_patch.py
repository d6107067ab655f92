"""Fused patch-stencil Pallas kernel: correctness vs the XLA path + timing.

    python tools/exp_patch.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from femus_tpu.algebra.patchstencil import spmv_patch_pallas
from tools.exp_bell2 import timed


def build():
    from femus_tpu.assembly.bc import generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.mesh.gambit import read_neu
    from femus_tpu.mesh.patches import refine_patched

    levels = int(os.environ.get("BENCH_PATCH_LEVELS", "4"))
    coarse = read_neu(
        "/root/reference/unittests/testNSSteadyDD/input/nsbenc.neu")
    fine, plan = refine_patched(coarse, levels)
    asm = Assembler(fine, [Unknown("u", "biquadratic")], quad_order="fifth",
                    dtype=jnp.float32)
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    asm.set_patch_layout(plan)
    assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
    _, data = assemble(jnp.zeros(asm.n_dofs_pad, jnp.float32),
                       asm.device_tables())
    return asm, asm.op_with(data)


def main():
    asm, A = build()
    nnz = asm.pattern.nnz
    H, P, Pp, E, ne, nv_, n = A.meta
    wt_bytes = A.wt.size * 4
    print(f"H={H} P={P} Pp={Pp} n={n} nnz={nnz} wt={wt_bytes/1e6:.1f} MB "
          f"traffic bound ~{nnz/(wt_bytes/8.2e11)/1e9:.0f} Gnnz/s",
          flush=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32)
    y_ref = np.asarray(jax.jit(A.matvec)(x))
    y_new = np.asarray(jax.jit(lambda v: spmv_patch_pallas(A, v))(x))
    err = np.linalg.norm(y_new - y_ref) / np.linalg.norm(y_ref)
    print(f"relerr vs XLA path: {err:.2e}", flush=True)
    t0 = timed(lambda op, v: op.matvec(v), x, A)
    print(f"XLA path   : {t0*1e6:7.1f} us ({nnz/t0/1e9:6.2f} Gnnz/s)",
          flush=True)
    t1 = timed(lambda op, v: spmv_patch_pallas(op, v), x, A)
    print(f"fused      : {t1*1e6:7.1f} us ({nnz/t1/1e9:6.2f} Gnnz/s)",
          flush=True)


if __name__ == "__main__":
    main()
