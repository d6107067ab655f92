"""Transient system tests: heat equation with Crank-Nicolson / backward Euler
(reference tutorial ex20, TransientSystem), 2-stage Gauss IRK (050_RK)."""
import numpy as np
import pytest
import jax.numpy as jnp

from femus_tpu.assembly.forms import poisson
from femus_tpu.assembly.norms import error_norms
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.systems.transient import (ImplicitRungeKuttaSystem,
                                         TransientLinearImplicitSystem,
                                         crank_nicolson, irk_form,
                                         theta_transient)

pi = np.pi
LAM = 2 * pi ** 2


def exact(x, t):
    return np.exp(-LAM * t) * np.sin(pi * x[:, 0]) * np.sin(pi * x[:, 1])


def make_heat(n=8, theta=0.5):
    ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic", time_order=1)
    ml_sol.initialize("u", lambda x: exact(x, 0.0))
    ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
    ml_sol.generate_bdc("u")
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(TransientLinearImplicitSystem, "Heat")
    sys.add_unknown("u")
    base = poisson("u", "biquadratic")        # F(u) = int grad u . grad phi
    sys.set_assembly(theta_transient(base, {"u": "biquadratic"}, theta=theta))
    sys.config.outer = "cg"
    sys.config.use_mg = False
    sys.config.rtol = 1e-12
    return prob, sys


@pytest.mark.parametrize("theta", [1.0, 0.5])
def test_heat_equation(theta):
    errs = []
    for dt in (0.02, 0.01):
        prob, sys = make_heat(8, theta)
        sys.init_time(dt)
        sys.init()
        T = 0.1
        nsteps = int(round(T / dt))
        for _ in range(nsteps):
            sys.time_step()
        l2, _ = error_norms(prob.ml_mesh.finest(), "biquadratic",
                            jnp.asarray(prob.ml_sol.sol[-1]["u"]),
                            lambda x: jnp.exp(-LAM * T) * jnp.sin(pi * x[:, 0])
                            * jnp.sin(pi * x[:, 1]))
        errs.append(l2)
    order = np.log2(errs[0] / errs[1])
    expect = 1.0 if theta == 1.0 else 2.0
    # spatial error floor slightly pollutes the observed order
    assert order > expect - 0.35, (order, errs)


def test_irk_gauss2():
    """2-stage Gauss IRK (order 4 in time) on the heat equation: error should
    be dominated by space, far below the CN temporal error at same dt."""
    n, dt, T = 8, 0.025, 0.1
    ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic", time_order=1)
    ImplicitRungeKuttaSystem.add_stage_fields(ml_sol, ["u"], 2)
    ml_sol.initialize("u", lambda x: exact(x, 0.0))
    # stage unknowns: Dirichlet zero on the boundary (k = du/dt = 0 there)
    ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
    ml_sol.generate_bdc()
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(ImplicitRungeKuttaSystem, "HeatRK")
    sys.add_unknown("u@0", "u@1")
    sys.setup_rk(["u"], 2)
    base = poisson("u", "biquadratic")
    sys.set_assembly(irk_form(base, {"u": "biquadratic"}, 2))
    sys.config.outer = "gmres"
    sys.config.use_mg = False
    sys.config.rtol = 1e-12
    sys.config.max_nonlinear = 3
    sys.init_time(dt)
    sys.init()
    for _ in range(int(round(T / dt))):
        sys.time_step()
    l2, _ = error_norms(prob.ml_mesh.finest(), "biquadratic",
                        jnp.asarray(prob.ml_sol.sol[-1]["u"]),
                        lambda x: jnp.exp(-LAM * T) * jnp.sin(pi * x[:, 0])
                        * jnp.sin(pi * x[:, 1]))
    # CN at this dt gives ~2e-4; Gauss-2 should sit at the spatial floor
    assert l2 < 5e-5, l2


def test_time_switching_bc_mask():
    """A Dirichlet wall that switches TYPE mid-run (Dirichlet -> natural at
    t >= 0.05, reference UpdateBdc regenerating the Bdc codes each step):
    the regenerated mask must reach the jitted step — the formerly pinned
    boundary dofs start evolving after the switch instead of staying frozen."""
    n, dt = 6, 0.01
    ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic", time_order=1)
    ml_sol.initialize("u", lambda x: np.sin(pi * x[:, 0]) * np.sin(pi * x[:, 1]))

    def bc(var, x, grp, t):
        if np.isclose(x[0], 1.0) and t >= 0.05:
            return False, 0.0            # right wall released (natural)
        return True, 0.0

    ml_sol.attach_bc(bc)
    ml_sol.generate_bdc("u")
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(TransientLinearImplicitSystem, "Heat")
    sys.add_unknown("u")
    sys.set_assembly(theta_transient(poisson("u", "biquadratic"),
                                     {"u": "biquadratic"}, theta=1.0))
    sys.config.outer = "cg"
    sys.config.use_mg = False
    sys.config.rtol = 1e-12
    sys.init_time(dt, time_dependent_bc=True)
    sys.init()

    mesh = prob.ml_mesh.finest()
    dm = mesh.dofmap("biquadratic")
    right = np.isclose(mesh.coords[dm.nodes, 0], 1.0)
    interior_right = right & (mesh.coords[dm.nodes, 1] > 0.2) \
        & (mesh.coords[dm.nodes, 1] < 0.8)

    for _ in range(4):                               # t = 0.04: still pinned
        sys.time_step()
    assert np.abs(prob.ml_sol.sol[-1]["u"][right]).max() == 0.0
    for _ in range(3):                               # through the switch
        sys.time_step()
    released = np.abs(prob.ml_sol.sol[-1]["u"][interior_right]).max()
    assert released > 1e-4, released                 # wall now evolves
    assert np.isfinite(prob.ml_sol.sol[-1]["u"]).all()
