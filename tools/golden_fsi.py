"""Driver: reproduce testFSISteady golden norms (see apps/fsi_bench.py)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from femus_tpu.apps import fsi_bench


def to_csr(pattern, data, n):
    w = pattern.width
    rows = np.repeat(np.arange(pattern.n_rows), w)
    cols = np.asarray(pattern.cols).ravel()
    vals = np.asarray(data).ravel()
    valid = np.asarray(pattern.valid).ravel()
    return sp.csr_matrix((vals[valid], (rows[valid], cols[valid])),
                         shape=(pattern.n_rows, pattern.n_rows))[:n, :n]


def main(levels=3):
    mesh = fsi_bench.load_mesh(levels)
    print(f"level {levels}: {mesh.coords.shape[0]} nodes, "
          f"{mesh.conn.shape[0]} elems")
    asm = fsi_bench.make_assembler(mesh)
    print("n_dofs", asm.n_dofs, "ell width", asm.pattern.width)
    assemble = asm.make_assemble_fn()
    aux = {"smark": jnp.asarray(fsi_bench.smark_dof_field(asm, mesh))}

    u = apply = np.zeros(asm.n_dofs)
    from femus_tpu.assembly.bc import apply_dirichlet_values
    u = apply_dirichlet_values(asm, u)

    for it in range(25):
        R, data = assemble(jnp.asarray(u), aux_fields=aux)
        r = np.asarray(R)[:asm.n_dofs]
        rn = np.linalg.norm(r)
        print(f"  newton {it}: |R| = {rn:.3e}")
        if not np.isfinite(rn):
            print("  NaN residual!"); return
        if rn < 1e-11:
            break
        J = to_csr(asm.pattern, data, asm.n_dofs)
        du = spla.spsolve(J.tocsc(), r)
        # damped step if the full step breaks the geometry (J<=0 / NaN)
        step = 1.0
        while step > 1e-3:
            R2, _ = assemble(jnp.asarray(u - step * du), aux_fields=aux)
            if np.isfinite(np.linalg.norm(np.asarray(R2)[:asm.n_dofs])):
                break
            step *= 0.5
        u = u - step * du

    for k in ("DX", "DY", "U", "V", "P"):
        n = fsi_bench.var_norm(asm, u, k)
        print(f"|{k}| = {n:.14f}  gold {fsi_bench.GOLD[k]:.14f}  "
              f"absdiff {abs(n - fsi_bench.GOLD[k]):.2e}  tol {fsi_bench.TOL[k]:.0e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
