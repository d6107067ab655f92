"""Willmore flow of a graph (reference applications/Willmore/WillmoreGraph).

Steady Willmore system in the u/W coupled form of ex2.cpp:485-522.  Exact
solution: sphere caps u = sqrt(R^2 - r^2), W = -1/u (spheres are Willmore
surfaces; the reference uses the same anchor via its sphere boundary data,
ex2.cpp:34-52).
"""
import numpy as np
import jax.numpy as jnp

from femus_tpu.assembly.forms import willmore_graph
from femus_tpu.assembly.norms import error_norms
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.systems.system import NonLinearImplicitSystem

R = 1.2


def exact_u(x):
    r2 = (x[:, 0] - 0.5) ** 2 + (x[:, 1] - 0.5) ** 2
    return jnp.sqrt(R * R - r2)


def exact_w(x):
    return -1.0 / exact_u(x)


def _bc(var, x, grp, t):
    r2 = (x[0] - 0.5) ** 2 + (x[1] - 0.5) ** 2
    u = float(np.sqrt(R * R - r2))
    return True, (u if var == "u" else -1.0 / u)


def test_willmore_sphere_cap_convergence():
    errs = []
    for n in (4, 8):
        ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 1)
        ml_sol = MultiLevelSolution(ml_mesh)
        ml_sol.add_solution("u", "biquadratic")
        ml_sol.add_solution("W", "biquadratic")
        ml_sol.attach_bc(_bc)
        ml_sol.initialize("u", lambda x: np.asarray(exact_u(jnp.asarray(x))))
        ml_sol.initialize("W", lambda x: np.asarray(exact_w(jnp.asarray(x))))
        ml_sol.generate_bdc()
        prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="seventh")
        sys = prob.add_system(NonLinearImplicitSystem, "Willmore")
        sys.add_unknown("u", "W")
        sys.set_assembly(willmore_graph("u", "W"))
        sys.config.outer = "gmres"
        sys.config.use_mg = False
        sys.config.restart = 100
        sys.config.max_outer = 60
        sys.config.rtol = 1e-12
        sys.config.nonlinear_tol = 1e-11
        sys.init()
        sys.solve()
        l2, _ = error_norms(ml_mesh.finest(), "biquadratic",
                            jnp.asarray(ml_sol.sol[-1]["u"]), exact_u)
        errs.append(l2)
    assert errs[-1] < 2e-5, errs
    assert np.log2(errs[0] / errs[1]) > 2.5, errs
