"""Matrix-free fine-level operator path (SURVEY.md §7 "two matrix paths").

The finest level's operator action is ``jax.linearize`` of the residual —
no fine-level ELL data is materialized; the smoother runs Chebyshev on a
scatter-assembled diagonal; the first coarse level is re-assembled on its
own mesh at the restricted state and deeper levels Galerkin-coarsen from it
(reference equivalent: operator application inside KSP without reassembly).
"""
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
from femus_tpu.systems.system import (LinearImplicitSystem,
                                      NonLinearImplicitSystem)

pi = np.pi


def exact_u(x):
    return jnp.sin(jnp.pi * x[:, 0]) * jnp.sin(jnp.pi * x[:, 1])


def _poisson_problem(operator, nlevels=3):
    ml_mesh = MultiLevelMesh(unit_box((4, 4), "quad"), nlevels)
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
    sys.config.operator = operator
    sys.config.rtol = 1e-10
    sys.init()
    return prob, sys


def test_poisson_matrix_free_matches_assembled():
    prob_a, sys_a = _poisson_problem("assembled")
    sys_a.solve()
    prob_m, sys_m = _poisson_problem("matrix_free")
    info = sys_m.solve()
    ua = prob_a.ml_sol.sol[-1]["u"]
    um = prob_m.ml_sol.sol[-1]["u"]
    assert np.linalg.norm(ua - um) / np.linalg.norm(ua) < 1e-8
    l2, _ = error_norms(prob_m.ml_mesh.finest(), "biquadratic",
                        jnp.asarray(um), exact_u)
    assert l2 < 5e-5, (l2, info)
    # MG still effective: well under one restart cycle of plain GMRES
    assert info["iters"] <= 40, info


def test_ns_matrix_free_newton():
    """NS manufactured solution through matrix-free Newton-Krylov with the
    rediscretized-coarse MG preconditioner (Vanka on the assembled coarse
    level, Chebyshev on the matrix-free fine level)."""
    n = 6
    ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 2)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic")
    ml_sol.add_solution("v", "biquadratic")
    ml_sol.add_solution("p", "linear")

    def _uex(x, y):
        return jnp.sin(pi * x) * jnp.cos(pi * y)

    def _vex(x, y):
        return -jnp.cos(pi * x) * jnp.sin(pi * y)

    def _pex(x, y):
        return jnp.sin(pi * x) * jnp.sin(pi * y)

    def ns_force(xq):
        def one(x, y):
            comps = []
            for comp in (_uex, _vex):
                lap = (jax.hessian(comp, 0)(x, y)
                       + jax.hessian(comp, 1)(x, y))
                adv = (_uex(x, y) * jax.grad(comp, 0)(x, y)
                       + _vex(x, y) * jax.grad(comp, 1)(x, y))
                comps.append(-lap + adv)
            gp = jnp.array([jax.grad(_pex, 0)(x, y),
                            jax.grad(_pex, 1)(x, y)])
            return jnp.array(comps) + gp
        return jax.vmap(one)(xq[:, 0], xq[:, 1])

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
    pnode = ml_mesh.finest().dofmap("linear").nodes[0]
    px = ml_mesh.finest().coords[pnode]
    ml_sol.fix_solution_at_point(
        "p", 0, float(np.sin(pi * px[0]) * np.sin(pi * px[1])))

    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(NonLinearImplicitSystem, "NS")
    sys.add_unknown("u", "v", "p")
    sys.set_assembly(navier_stokes(("u", "v"), "p", nu=1.0, force=ns_force))
    cfg = sys.config
    cfg.operator = "matrix_free"
    cfg.smoother = "vanka"
    cfg.restart = 80
    cfg.max_outer = 20
    cfg.rtol = 1e-10
    cfg.nonlinear_tol = 1e-9
    sys.init()
    sys.solve()
    eps = sys.history[-1]["eps"]
    assert max(eps.values()) < 1e-9, sys.history

    l2u, _ = error_norms(ml_mesh.finest(), "biquadratic",
                         jnp.asarray(ml_sol.sol[-1]["u"]),
                         lambda x: _uex(x[:, 0], x[:, 1]))
    assert l2u < 2e-4, l2u
