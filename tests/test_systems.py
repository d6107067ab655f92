"""Systems-layer tests: Poisson through the MultiLevelProblem API (V and F
cycles), steady Navier-Stokes with Newton (manufactured solution, forcing
derived by AD), Boussinesq 3-field coupling."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.assembly.forms import navier_stokes, poisson
from femus_tpu.assembly.norms import error_norms
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.systems.system import LinearImplicitSystem, NonLinearImplicitSystem

pi = np.pi


def exact_u(x):
    return jnp.sin(jnp.pi * x[:, 0]) * jnp.sin(jnp.pi * x[:, 1])


@pytest.mark.parametrize("mg_type", ["V", "F"])
def test_poisson_system_api(mg_type):
    ml_mesh = MultiLevelMesh(unit_box((4, 4), "quad"), 3)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic")
    ml_sol.initialize("u")
    ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
    ml_sol.generate_bdc("u")
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(LinearImplicitSystem, "Poisson")
    sys.add_unknown("u")
    sys.set_assembly(poisson("u", "biquadratic",
                             rhs=lambda x: 2 * jnp.pi ** 2 * exact_u(x)))
    sys.config.outer = "cg"
    sys.config.mg_type = mg_type
    sys.config.rtol = 1e-10
    sys.init()
    info = sys.solve()
    l2, h1 = error_norms(ml_mesh.finest(), "biquadratic",
                         jnp.asarray(ml_sol.sol[-1]["u"]), exact_u)
    assert l2 < 5e-5, (l2, info)
    assert info["residual"] < 1e-9


# ---- steady Navier-Stokes, manufactured solution ----------------------

NU = 1.0


def _uex(x, y):
    return jnp.sin(pi * x) * jnp.cos(pi * y)


def _vex(x, y):
    return -jnp.cos(pi * x) * jnp.sin(pi * y)


def _pex(x, y):
    return jnp.sin(pi * x) * jnp.sin(pi * y)


def ns_force(xq):
    """f = -nu lap(U) + (U . grad) U + grad p, from AD of the exact fields."""
    def one(x, y):
        comps = []
        for comp in (_uex, _vex):
            lap = (jax.hessian(comp, 0)(x, y) + jax.hessian(comp, 1)(x, y))
            adv = (_uex(x, y) * jax.grad(comp, 0)(x, y)
                   + _vex(x, y) * jax.grad(comp, 1)(x, y))
            comps.append(-NU * lap + adv)
        gp = jnp.array([jax.grad(_pex, 0)(x, y), jax.grad(_pex, 1)(x, y)])
        return jnp.array(comps) + gp
    return jax.vmap(one)(xq[:, 0], xq[:, 1])


def make_ns_problem(n, nlevels=1):
    ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), nlevels)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic")
    ml_sol.add_solution("v", "biquadratic")
    ml_sol.add_solution("p", "linear")

    def bc(var, x, grp, t):
        if var == "u":
            return True, float(np.sin(pi * x[0]) * np.cos(pi * x[1]))
        if var == "v":
            return True, float(-np.cos(pi * x[0]) * np.sin(pi * x[1]))
        return False, 0.0

    ml_sol.attach_bc(bc)
    for name in ("u", "v", "p"):
        ml_sol.initialize(name)
    ml_sol.generate_bdc("u", "v", "p")
    # pressure gauge: pin p at dof 0 to the exact value there (must follow
    # generate_bdc, which rebuilds the code arrays)
    pnode = ml_mesh.finest().dofmap("linear").nodes[0]
    px = ml_mesh.finest().coords[pnode]
    ml_sol.fix_solution_at_point("p", 0, float(np.sin(pi * px[0]) * np.sin(pi * px[1])))

    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(NonLinearImplicitSystem, "NS")
    sys.add_unknown("u", "v", "p")
    sys.set_assembly(navier_stokes(("u", "v"), "p", nu=NU, force=ns_force))
    sys.config.outer = "gmres"
    sys.config.use_mg = False
    sys.config.restart = 120
    sys.config.max_outer = 40
    sys.config.rtol = 1e-11
    sys.config.nonlinear_tol = 1e-10
    sys.init()
    return prob, sys


def test_navier_stokes_manufactured():
    errs = []
    for n in (4, 8):
        prob, sys = make_ns_problem(n)
        sys.solve()
        ml = prob.ml_mesh
        ml_sol = prob.ml_sol
        l2u, _ = error_norms(ml.finest(), "biquadratic",
                             jnp.asarray(ml_sol.sol[-1]["u"]),
                             lambda x: _uex(x[:, 0], x[:, 1]))
        l2p, _ = error_norms(ml.finest(), "linear",
                             jnp.asarray(ml_sol.sol[-1]["p"]),
                             lambda x: _pex(x[:, 0], x[:, 1]))
        errs.append((l2u, l2p))
        # Newton converged
        eps = sys.history[-1]["eps"]
        assert max(eps.values()) < 1e-9, sys.history
    order_u = np.log2(errs[0][0] / errs[1][0])
    order_p = np.log2(errs[0][1] / errs[1][1])
    assert order_u > 2.5, (order_u, errs)
    assert order_p > 1.5, (order_p, errs)


def test_ns_newton_quadratic_convergence():
    prob, sys = make_ns_problem(6)
    sys.solve()
    eps_seq = [max(h["eps"].values()) for h in sys.history]
    # quadratic-ish contraction until solver floor
    assert eps_seq[-1] < 1e-10
    assert len(eps_seq) <= 8, eps_seq


# ---- Boussinesq: differentially heated cavity ---------------------------

def test_boussinesq_heated_cavity():
    """Buoyancy-driven cavity (reference 04_boussinesq.hpp semantics,
    004_Boussinesq app): hot left wall T=0.5, cold right wall T=-0.5,
    insulated top/bottom, no-slip everywhere; at low Ra the flow is a single
    clockwise convection roll (hot fluid rises on the left)."""
    from femus_tpu.assembly.forms import boussinesq
    ml_mesh = MultiLevelMesh(unit_box((8, 8), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    for name in ("u", "v", "T"):
        ml_sol.add_solution(name, "biquadratic")
    ml_sol.add_solution("p", "linear")
    for name in ("u", "v", "p", "T"):
        ml_sol.initialize(name)

    def bc(var, x, grp, t):
        if var in ("u", "v"):
            return True, 0.0
        if var == "T":
            if abs(x[0]) < 1e-9:
                return True, 0.5            # hot left wall
            if abs(x[0] - 1.0) < 1e-9:
                return True, -0.5           # cold right wall
            return False, 0.0               # insulated top/bottom
        return False, 0.0                   # pressure: natural

    ml_sol.attach_bc(bc)
    ml_sol.generate_bdc("u", "v", "p", "T")
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(NonLinearImplicitSystem, "Boussinesq")
    sys.add_unknown("u", "v", "p", "T")
    sys.set_assembly(boussinesq(("u", "v"), "p", "T", ra=1e3, pr=0.71))
    sys.config.outer = "gmres"
    sys.config.rtol = 1e-10
    sys.config.max_nonlinear = 12
    sys.config.nonlinear_tol = 1e-8
    sys.init()
    hist = sys.solve()
    u = ml_sol.sol[-1]["u"]
    v = ml_sol.sol[-1]["v"]
    T = ml_sol.sol[-1]["T"]
    xy = ml_mesh.finest().coords[ml_mesh.finest().dofmap("biquadratic").nodes]
    # convection actually happens
    assert np.abs(u).max() > 1e-3 and np.abs(v).max() > 1e-3
    # clockwise roll: fluid rises near hot (left) wall ...
    left_mid = (np.abs(xy[:, 0] - 0.25) < 0.06) & (np.abs(xy[:, 1] - 0.5) < 0.06)
    assert v[left_mid].mean() > 0
    # ... and moves right along the top
    top_mid = (np.abs(xy[:, 0] - 0.5) < 0.06) & (np.abs(xy[:, 1] - 0.75) < 0.06)
    assert u[top_mid].mean() > 0
    # temperature bounded by wall values (maximum principle)
    assert T.max() <= 0.5 + 1e-6 and T.min() >= -0.5 - 1e-6
