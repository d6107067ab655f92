"""testNSSteadyDD golden norms through the framework's OWN solver stack.

Unlike tests/test_golden_ns.py (which pins the discretization via a scipy-LU
escape hatch), every linear solve here is ``System.step_fn`` — batched
element-last assembly, Galerkin PtAP coarse operators, V-cycle-preconditioned
GMRES with multiplicative Vanka smoothers, dense coarse solve — driven by the
F-cycle Newton ratchet, exactly the reference's
``NonLinearImplicitSystem::MGsolve`` (NonLinearImplicitSystem.cpp:157-260 +
LinearEquationSolverPetsc.cpp:294-353).  No scipy anywhere in the loop.

Also asserts the OPERATIONAL baseline: GMRES iterations-to-tolerance per
Newton step stay single-digit at every level (mesh-independent MG behavior,
BASELINE.md "iterations-to-tol" metric) and Newton contracts quadratically.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from femus_tpu.apps import ns_bench


def test_golden_ns_through_own_mg_solver():
    prob, sys_ = ns_bench.make_ns_system(levels=4)
    sys_.solve()

    # golden norms at level 3 (reference main.cpp:204-237, rtol 1e-6)
    for k in ("U", "V", "P"):
        got = float(np.linalg.norm(prob.ml_sol.sol[-1][k]))
        assert got == pytest.approx(ns_bench.GOLD[k], rel=1e-6), k

    # operational: per-level iteration counts (single-digit, level-flat MG)
    for h in sys_.history:
        if h["level"] > 0:
            assert h["lin_iters"] <= 15, h
    # Newton converged below tolerance at the finest level
    fin = [h for h in sys_.history if h["level"] == 3]
    assert max(fin[-1]["eps"].values()) < 1e-9
    assert len(fin) <= 6, [max(h["eps"].values()) for h in fin]

    # --- temperature through the same solver stack -----------------------
    # The reference's stored T norm pins only the Bdc-initialized field (see
    # apps/ns_bench.py docstring); GOLD_SOLVED_T pins the actual coupled
    # advection-diffusion solve in the converged velocity (direct-LU
    # reference).  V_CYCLE = finest level only, MG(Vanka)-preconditioned
    # GMRES, single linear solve.
    sysT = ns_bench.make_temperature_system(prob)
    outT = sysT.solve()
    tn = float(np.linalg.norm(prob.ml_sol.sol[-1]["T"]))
    assert tn == pytest.approx(ns_bench.GOLD_SOLVED_T, rel=1e-6)
    assert outT["iters"] <= 15, outT
