"""Golden-value regression vs the reference's testFSISteady.

Reproduces the stored L2 norms of unittests/testFSISteady/main.cpp:148-196
(monolithic steady FSI: Turek channel + cylinder + elastic Neo-Hookean beam)
within the reference's own absolute tolerances, using this framework's
reader, refinement, Q2/P1dc spaces, and the residual defined verbatim in
apps/fsi_bench.py.  Newton reuses the first LU factorization quasi-Newton
style (the reference does the same with its frozen Picard matrix,
main.cpp:nwtn_alg=false) and refactors only when contraction stalls.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from femus_tpu.apps import fsi_bench
from femus_tpu.assembly.bc import apply_dirichlet_values


def _to_csr(pattern, data, n):
    w = pattern.width
    rows = np.repeat(np.arange(pattern.n_rows), w)
    cols = np.asarray(pattern.cols).ravel()
    vals = np.asarray(data).ravel()
    valid = np.asarray(pattern.valid).ravel()
    return sp.csr_matrix((vals[valid], (rows[valid], cols[valid])),
                         shape=(pattern.n_rows, pattern.n_rows))[:n, :n]


def test_golden_fsi_norms():
    mesh = fsi_bench.load_mesh(3)
    asm = fsi_bench.make_assembler(mesh)
    aux = {"smark": jnp.asarray(fsi_bench.smark_dof_field(asm, mesh))}
    assemble = asm.make_assemble_fn()
    assemble_res = asm.make_assemble_fn(with_jacobian=False)

    u = apply_dirichlet_values(asm, np.zeros(asm.n_dofs))
    lu, rn_prev = None, np.inf
    for it in range(25):
        if lu is None:
            R, data = assemble(jnp.asarray(u), aux_fields=aux)
            lu = spla.splu(_to_csr(asm.pattern, data, asm.n_dofs).tocsc())
        else:
            R, _ = assemble_res(jnp.asarray(u), aux_fields=aux)
        r = np.asarray(R)[:asm.n_dofs]
        rn = np.linalg.norm(r)
        assert np.isfinite(rn), f"NaN residual at iteration {it}"
        if rn < 1e-10:
            break
        if rn > 0.6 * rn_prev:       # stalled -> refresh Jacobian
            lu = None
            rn_prev = np.inf
            continue
        rn_prev = rn
        u = u - lu.solve(r)
    else:
        pytest.fail("FSI Newton did not converge")

    norms = {k: fsi_bench.var_norm(asm, u, k) for k in fsi_bench.GOLD}
    print("FSI norms:", norms)
    for k, n in norms.items():
        assert abs(n - fsi_bench.GOLD[k]) < fsi_bench.TOL[k], (
            k, n, fsi_bench.GOLD[k])
