"""Optimal control: KKT optimality (cost decreases in no direction) and PDAS
box-constraint enforcement."""
import numpy as np
import pytest
import jax.numpy as jnp

from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.optimal_control import (PDASControlSystem,
                                               cost_functional,
                                               elliptic_control_form)
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution

pi = np.pi
ALPHA = 1e-3


def y_d(x):
    return jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1])


def make_control(n=8, bounds=None):
    ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    for v in ("y", "l", "u"):
        ml_sol.add_solution(v, "biquadratic")

    def bc(var, x, grp, t):
        if var in ("y", "l"):
            return True, 0.0
        return False, 0.0

    ml_sol.attach_bc(bc)
    for v in ("y", "l", "u"):
        ml_sol.initialize(v)
    ml_sol.generate_bdc()
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(PDASControlSystem, "OC")
    sys.add_unknown("y", "l", "u")
    sys.set_assembly(elliptic_control_form("y", "l", "u", y_target=y_d,
                                           alpha=ALPHA))
    sys.config.outer = "gmres"
    sys.config.use_mg = False
    sys.config.restart = 120
    sys.config.max_outer = 30
    sys.config.rtol = 1e-11
    sys.config.max_nonlinear = 3
    sys.init()
    if bounds:
        sys.set_control_bounds("u", bounds[0], bounds[1], alpha=ALPHA)
    return prob, sys


def solve_state_for_control(prob, u_ctrl):
    """Solve the state equation alone for a given control (for J comparison)."""
    import jax
    from femus_tpu.assembly.bc import apply_dirichlet_values, generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.algebra.krylov import cg
    mesh = prob.ml_mesh.finest()
    asm = Assembler(mesh, [Unknown("y", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("y", "biquadratic"))
    asm.add_aux_field("uc", "biquadratic")

    def form(ops, u, aux):
        g = ops.grad("biquadratic", u["y"])
        return {"y": ops.tgrad("biquadratic", g)
                - ops.t("biquadratic", ops.value("biquadratic", aux["uc"]))}

    asm.set_volume_form(form)
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    y0 = jnp.asarray(apply_dirichlet_values(asm, np.zeros(asm.n_dofs)))
    R, data = jax.jit(asm.make_assemble_fn())(y0, {"uc": jnp.asarray(u_ctrl)})
    A = asm.op_with(data)
    d = A.diagonal()
    dy, _ = cg(A.matvec, -R, M=lambda r: r / d, tol=1e-12, maxiter=3000)
    return np.asarray(y0 + dy)


def test_unconstrained_optimality():
    prob, sys = make_control(6)
    sys.solve()
    ml = prob.ml_mesh
    sol = prob.ml_sol.sol[-1]
    J_star = cost_functional(ml.finest(), "biquadratic", sol["y"], sol["u"],
                             y_d, ALPHA)
    # gradient eq residual: alpha u = l at dofs (weakly) — strong check here
    assert np.allclose(ALPHA * sol["u"], sol["l"], atol=1e-6)
    # perturbing the control must not decrease J
    rng = np.random.default_rng(0)
    for _ in range(3):
        du = rng.normal(size=sol["u"].shape)
        u_pert = sol["u"] + 1e-2 * du / np.linalg.norm(du) * np.linalg.norm(sol["u"])
        y_pert = solve_state_for_control(prob, u_pert)
        J_pert = cost_functional(ml.finest(), "biquadratic", y_pert, u_pert,
                                 y_d, ALPHA)
        assert J_pert >= J_star - 1e-12, (J_pert, J_star)


def test_pdas_box_constraints():
    prob, sys = make_control(6, bounds=(0.5, 8.0))
    info = sys.solve_pdas()
    u = prob.ml_sol.sol[-1]["u"]
    assert u.max() <= 8.0 + 1e-8 and u.min() >= 0.5 - 1e-8
    # the unconstrained optimum exceeds these bounds, so the sets are active
    assert info["active_hi"] > 0 and info["active_lo"] > 0
    assert info["pdas_iters"] < 15
    # multiplier sign conditions: mu = l - alpha*u >= 0 on the upper-active
    # set, <= 0 on the lower-active set (up to mass-matrix smearing at the
    # free boundary)
    lam = prob.ml_sol.sol[-1]["l"]
    mu = lam - ALPHA * u
    hi = np.isclose(u, 8.0)
    lo = np.isclose(u, 0.5)
    assert np.quantile(mu[hi], 0.1) > -1e-4
    assert np.quantile(mu[lo], 0.9) < 1e-4
