"""Poisson h-convergence orders over a refinement hierarchy.

Reference: applications/000_tutorial/ex02_poisson_* and the FE_convergence
harness (FE_convergence.hpp:29-139, order printout :400-471).
"""
import _common  # noqa: F401
import jax.numpy as jnp
import numpy as np

from femus_tpu.assembly.forms import poisson
from femus_tpu.mesh.generation import unit_box
from femus_tpu.systems.fe_convergence import convergence_study
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.systems.system import LinearImplicitSystem

pi = np.pi


def exact(x):
    return jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1])


def exact_grad(x):
    return jnp.stack([pi * jnp.cos(pi * x[:, 0]) * jnp.sin(pi * x[:, 1]),
                      pi * jnp.sin(pi * x[:, 0]) * jnp.cos(pi * x[:, 1])],
                     axis=-1)


def runner(family):
    def make_and_solve(ml_mesh):
        ml_sol = MultiLevelSolution(ml_mesh)
        ml_sol.add_solution("u", family)
        ml_sol.initialize("u")
        ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
        ml_sol.generate_bdc("u")
        prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
        sys = prob.add_system(LinearImplicitSystem, "Poisson")
        sys.add_unknown("u")
        sys.set_assembly(poisson("u", family,
                                 rhs=lambda x: 2 * pi * pi * exact(x)))
        sys.config.outer = "cg"
        sys.config.rtol = 1e-12
        sys.init()
        sys.solve()
        return ml_sol, {"u": family}
    return make_and_solve


def main():
    for family in ("linear", "serendipity", "biquadratic"):
        res = convergence_study(runner(family), unit_box((3, 3), "quad"), 3,
                                {"u": exact}, {"u": exact_grad})
        print(f"== {family} ==")
        print(res.report())


if __name__ == "__main__":
    main()
