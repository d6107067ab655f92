"""Global scalar unknown "theta" bordering the control KKT system.

Reference: the Dirichlet-boundary-control problems register a fake-P0
unknown "theta" whose single live dof is a Lagrange multiplier enforcing
zero net control flux (opt_systems_ns_dirichlet.hpp:78-161 registration,
:995-1012 bordered delta_theta rows/cols, 00_cost_functional.hpp:27-43
get_theta_value).  Here the same mechanism — a scalar linear constraint
B.x = g bordered onto the monolithic KKT operator — is solved by the
framework's block-elimination path (ScalarConstrainedSystem) and verified
against a direct sparse LU of the full bordered matrix.

Problem: distributed elliptic control with a zero-mean control constraint

    min 1/2||y - y_d||^2 + alpha/2||u||^2
    s.t. -lap y = u + f,   y = 0 on bdry,   int_Omega u dx = 0.
"""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla
import jax.numpy as jnp

from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.systems.optimal_control import (ScalarConstrainedSystem,
                                               assemble_constraint_vector,
                                               elliptic_control_form)

pi = np.pi
ALPHA = 1e-2


def y_target(x):
    # asymmetric target so the unconstrained optimal control has nonzero mean
    return jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1]) + x[:, 0] * x[:, 1]


def bc(var, x, grp, t):
    if var in ("y", "l"):
        return True, 0.0
    return False, 0.0


def _build(n=6):
    ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    for v in ("y", "l", "u"):
        ml_sol.add_solution(v, "biquadratic")
        ml_sol.initialize(v)
    ml_sol.attach_bc(bc)
    ml_sol.generate_bdc("y", "l", "u")
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(ScalarConstrainedSystem, "theta-control")
    sys.add_unknown("y", "l", "u")
    sys.set_assembly(elliptic_control_form(y_target=y_target, alpha=ALPHA))
    sys.config.rtol = 1e-12
    sys.config.use_mg = False
    sys.config.smoother = "jacobi"
    sys.init()
    return prob, sys


def _mean_functional(sys):
    def vol(ops, u, aux):
        return {"u": ops.t("biquadratic",
                           ops.pointwise(lambda x: jnp.ones(x.shape[0])))}
    return assemble_constraint_vector(sys, volume_form=vol)


def test_theta_bordered_vs_direct_lu():
    prob, sys = _build()
    B = _mean_functional(sys)
    sys.add_scalar_constraint("theta", B, rhs=0.0)
    out = sys.solve()

    # ---- direct reference: full bordered matrix, sparse LU -------------
    a = sys.assemblers[0]
    u0 = jnp.zeros(a.n_dofs_pad)
    fn = a.make_assemble_fn()
    R, data = fn(u0)
    A = sp.csr_matrix((np.asarray(data).ravel()[a.pattern.csr_to_ell_slots()],
                       a.pattern.indices, a.pattern.indptr),
                      shape=(a.n_dofs_pad, a.n_dofs_pad))
    n = a.n_dofs_pad
    K = sp.bmat([[A, sp.csr_matrix(B[:, None])],
                 [sp.csr_matrix(B[None, :]), None]], format="csc")
    rhs = np.concatenate([-np.asarray(R), [0.0]])
    ref = spla.spsolve(K, rhs)

    x = sys.gather(0)
    assert np.allclose(x, ref[:n], atol=1e-8)
    assert abs(sys.get_theta_value() - ref[n]) < 1e-8

    # the constraint actually holds, and actually binds (theta != 0)
    assert abs(B @ x) < 1e-9
    assert abs(sys.get_theta_value()) > 1e-6

    # Newton on the linear KKT system converges in one bordered step
    assert out["newton_it"] <= 1


def test_theta_inactive_when_constraint_natural():
    """An antisymmetric target (odd about x=1/2) gives a zero-mean optimal
    control: theta ~ 0 and the constraint does not bind."""
    prob, sys = _build()

    def y_sym(x):
        return jnp.sin(2 * pi * x[:, 0]) * jnp.sin(pi * x[:, 1])

    sys.set_assembly(elliptic_control_form(y_target=y_sym, alpha=ALPHA))
    sys.init()
    B = _mean_functional(sys)
    sys.add_scalar_constraint("theta", B)
    sys.solve()
    assert abs(sys.get_theta_value()) < 1e-7
