"""testFSISteady through the framework's OWN solver stack.

Chain of evidence (mirrors tests/test_golden_ns_mg.py for the FSI gate):
- tests/test_golden_fsi.py pins the DISCRETIZATION: the scipy-LU Newton on
  the fsifirst.neu hierarchy reproduces the reference's five golden norms
  at level 3 (testFSISteady main.cpp:148-196).
- THIS file pins the SOLVER: the same discretization solved end-to-end by
  ``fsi_bench.make_fsi_system`` — F-cycle Newton, per-level MG-preconditioned
  GMRES with material-split Vanka (ASM) smoothers, dense coarse solve, no
  external factorization — must land on the same solution as the LU path.

The quick gate runs the 2-level hierarchy (finest = level 1) and compares
MG vs LU per-variable norms tightly.  The full 4-level golden-norm run is
hour-scale on the CPU test box (the reference's gate is a compiled C++
binary), so it is gated behind FEMUS_HEAVY=1 in addition to the slow mark.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from femus_tpu.apps import fsi_bench


def test_fsi_mg_matches_lu_two_levels():
    """Steady monolithic FSI: the MG(material-Vanka)-GMRES F-cycle solve
    equals the direct-LU Newton solution of the same 2-level system."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    levels = 2
    prob, sys_ = fsi_bench.make_fsi_system(levels=levels)
    sys_.solve()
    asm = sys_.assemblers[-1]
    u_mg = np.asarray(sys_.gather(-1))

    # LU reference on the identical fine assembler/state bookkeeping:
    # re-init the same system and Newton-iterate with scipy splu
    prob2, sys2 = fsi_bench.make_fsi_system(levels=levels)
    import jax
    a = sys2.assemblers[-1]
    assemble = jax.jit(a.make_assemble_fn(pass_tables=True))
    tabs = a.device_tables_cached()
    u = jnp.asarray(sys2.gather(-1))
    aux = sys2._aux_arrays(levels - 1)
    pat = a.pattern
    w = pat.width
    rows = np.repeat(np.arange(pat.n_rows), w)
    valid = np.asarray(pat.valid).ravel()
    for _ in range(12):
        R, data = assemble(u, tabs, aux, {})
        vals = np.asarray(data).ravel()
        A = sp.csr_matrix((vals[valid], (rows[valid],
                                         np.asarray(pat.cols).ravel()[valid])),
                          shape=(pat.n_rows, pat.n_cols))
        delta = spla.splu(A.tocsc()).solve(-np.asarray(R))
        u = u + jnp.asarray(delta)
        if np.linalg.norm(delta) / max(np.linalg.norm(np.asarray(u)), 1e-30) < 1e-12:
            break
    u_lu = np.asarray(u)

    for k in ("DX", "DY", "U", "V", "P"):
        n_mg = fsi_bench.var_norm(asm, u_mg, k)
        n_lu = fsi_bench.var_norm(asm, u_lu, k)
        assert n_mg == pytest.approx(n_lu, rel=1e-7, abs=1e-10), (k, n_mg, n_lu)

    # operational: this is a CORRECTNESS gate, not an optimality gate — the
    # V(material-Vanka) cycle converges the steady monolithic saddle point
    # (Newton contracts, solution == LU) but is not iteration-optimal on it
    # (hundreds of fine-level GMRES iterations; the reference's own FSI gate
    # likewise runs high linear-iteration budgets, testFSISteady
    # main.cpp + LinearEquationSolverPetscAsm).  The bound below catches
    # stagnation/divergence, not suboptimality.
    for h in sys_.history:
        assert h["lin_iters"] <= 1500, h
    fin = [h for h in sys_.history if h["level"] == levels - 1]
    assert max(fin[-1]["eps"].values()) < 1e-9


@pytest.mark.skipif(not os.environ.get("FEMUS_HEAVY"),
                    reason="hour-scale on CPU (set FEMUS_HEAVY=1); the "
                           "reference golden gate is a compiled C++ binary")
def test_golden_fsi_through_own_mg_solver():
    """Full 4-level F-cycle: the five reference golden norms at level 3
    (testFSISteady main.cpp:148-196) through the own MG solver stack."""
    prob, sys_ = fsi_bench.make_fsi_system(levels=4)
    sys_.solve()
    asm = sys_.assemblers[-1]
    u = np.asarray(sys_.gather(-1))
    for k in ("DX", "DY", "U", "V", "P"):
        got = fsi_bench.var_norm(asm, u, k)
        assert abs(got - fsi_bench.GOLD[k]) < fsi_bench.TOL[k], (k, got)
