"""Solid mechanics tests: linear elasticity manufactured solution, finite
strain models (patch consistency + Newton convergence), mixed u/p form."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.assembly.forms import elasticity
from femus_tpu.assembly.norms import error_norms
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.systems.system import NonLinearImplicitSystem

pi = np.pi
LAM, MU = 2.0, 1.0


def _dx_ex(x, y):
    return jnp.sin(pi * x) * jnp.sin(pi * y)


def _dy_ex(x, y):
    return jnp.cos(pi * x) * jnp.cos(pi * y)


def lin_force(xq):
    """f = -div sigma(u) for the linear model, via AD."""
    def one(x, y):
        comps = []
        u = (_dx_ex, _dy_ex)
        # sigma_ij = lam div(u) delta_ij + mu (di uj + dj ui)
        def sigma(x, y):
            g = jnp.array([[jax.grad(u[i], j)(x, y) for j in range(2)]
                           for i in range(2)])
            eps = 0.5 * (g + g.T)
            return LAM * jnp.trace(eps) * jnp.eye(2) + 2 * MU * eps
        for i in range(2):
            div_i = sum(jax.grad(lambda a, b, i=i, j=j: sigma(a, b)[i, j], j)(x, y)
                        for j in range(2))
            comps.append(-div_i)
        return jnp.array(comps)
    return jax.vmap(one)(xq[:, 0], xq[:, 1])


def solve_elasticity(n, model, force=None, bc_exact=True):
    ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("dx", "biquadratic")
    ml_sol.add_solution("dy", "biquadratic")

    def bc(var, x, grp, t):
        if not bc_exact:
            return True, 0.0
        if var == "dx":
            return True, float(np.sin(pi * x[0]) * np.sin(pi * x[1]))
        return True, float(np.cos(pi * x[0]) * np.cos(pi * x[1]))

    ml_sol.attach_bc(bc)
    for v in ("dx", "dy"):
        ml_sol.initialize(v)
    ml_sol.generate_bdc()
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(NonLinearImplicitSystem, "Solid")
    sys.add_unknown("dx", "dy")
    sys.set_assembly(elasticity(("dx", "dy"), model=model, lam=LAM, mu=MU,
                                force=force))
    sys.config.outer = "gmres"
    sys.config.use_mg = False
    sys.config.rtol = 1e-12
    sys.config.nonlinear_tol = 1e-11
    sys.init()
    sys.solve()
    return prob, sys


def test_linear_elasticity_convergence():
    errs = []
    for n in (4, 8):
        prob, sys = solve_elasticity(n, "linear", lin_force)
        l2, _ = error_norms(prob.ml_mesh.finest(), "biquadratic",
                            jnp.asarray(prob.ml_sol.sol[-1]["dx"]),
                            lambda x: _dx_ex(x[:, 0], x[:, 1]))
        errs.append(l2)
    assert np.log2(errs[0] / errs[1]) > 2.5, errs


@pytest.mark.parametrize("model", ["saint-venant", "neo-hookean"])
def test_finite_strain_newton(model):
    """Stretch the top boundary: Newton must converge and produce a finite,
    nonzero displacement field."""
    ml_mesh = MultiLevelMesh(unit_box((4, 4), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("dx", "biquadratic")
    ml_sol.add_solution("dy", "biquadratic")

    def bc(var, x, grp, t):
        if grp == 3:                       # bottom clamped
            return True, 0.0
        if grp == 4 and var == "dy":       # top pulled up 5%
            return True, 0.05
        if grp == 4:
            return True, 0.0
        return False, 0.0

    ml_sol.attach_bc(bc)
    for v in ("dx", "dy"):
        ml_sol.initialize(v)
    ml_sol.generate_bdc()
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(NonLinearImplicitSystem, "Solid")
    sys.add_unknown("dx", "dy")
    sys.set_assembly(elasticity(("dx", "dy"), model=model, lam=LAM, mu=MU))
    sys.config.outer = "gmres"
    sys.config.use_mg = False
    sys.config.rtol = 1e-12
    sys.config.nonlinear_tol = 1e-10
    sys.init()
    sys.solve()
    eps = [max(h["eps"].values()) for h in sys.history]
    assert eps[-1] < 1e-9, eps
    assert len(eps) <= 8
    dy = prob.ml_sol.sol[-1]["dy"]
    assert np.isfinite(dy).all() and abs(dy).max() >= 0.05 - 1e-9


def test_mixed_up_incompressible():
    """Mixed u/p nearly-incompressible linear elasticity solves and yields
    near-zero divergence."""
    ml_mesh = MultiLevelMesh(unit_box((4, 4), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("dx", "biquadratic")
    ml_sol.add_solution("dy", "biquadratic")
    ml_sol.add_solution("pm", "linear")

    def bc(var, x, grp, t):
        if var == "pm":
            return False, 0.0
        if grp == 3:
            return True, 0.0
        if grp == 4:
            return True, 0.02 if var == "dx" else 0.0   # shear the top
        return False, 0.0

    ml_sol.attach_bc(bc)
    for v in ("dx", "dy", "pm"):
        ml_sol.initialize(v)
    ml_sol.generate_bdc()
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(NonLinearImplicitSystem, "Solid")
    sys.add_unknown("dx", "dy", "pm")
    sys.set_assembly(elasticity(("dx", "dy"), model="linear", lam=1.0, mu=MU,
                                pres="pm", incompressible=True))
    sys.config.outer = "gmres"
    sys.config.use_mg = False
    sys.config.restart = 80
    sys.config.rtol = 1e-12
    sys.init()
    sys.solve()
    # check div u ~ 0 in L2
    from femus_tpu.assembly.engine import Assembler, Unknown
    mesh = ml_mesh.finest()
    dxv = jnp.asarray(ml_sol.sol[-1]["dx"])
    dyv = jnp.asarray(ml_sol.sol[-1]["dy"])
    from femus_tpu.fe.tabulate import tabulate
    from femus_tpu.fe.geom import GEOMS
    g = GEOMS["quad"]
    t = tabulate("quad", "biquadratic", "fifth")
    conn = mesh.dofmap("biquadratic").conn
    coords = mesh.coords[mesh.conn[:, g.family_nodes["biquadratic"]]]
    gphi = jnp.asarray(t.dphi)

    def divsq(ce, de_x, de_y):
        J = jnp.einsum("qnd,nx->qdx", gphi, ce)
        invJ = jnp.linalg.inv(J)
        det = jnp.abs(jnp.linalg.det(J))
        dphi = jnp.einsum("qnd,qxd->qnx", gphi, invJ)
        div = (jnp.einsum("qn,n->q", dphi[:, :, 0], de_x)
               + jnp.einsum("qn,n->q", dphi[:, :, 1], de_y))
        return (div ** 2 * jnp.asarray(t.weights) * det).sum()

    tot = jax.vmap(divsq)(jnp.asarray(coords), dxv[jnp.asarray(conn)],
                          dyv[jnp.asarray(conn)]).sum()
    # Q2/Q1 enforces div u = 0 only against the Q1 test space: the pointwise
    # divergence is O(h^2), small relative to the imposed 2% shear
    assert float(jnp.sqrt(tot)) < 5e-3
    assert max(sys.history[-1]["eps"].values()) < 1e-9
