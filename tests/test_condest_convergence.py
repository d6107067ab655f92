"""Condition estimator vs dense SVD; FE-convergence harness orders."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.assembly.bc import apply_dirichlet_values, generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import poisson
from femus_tpu.algebra.condest import cond_2norm
from femus_tpu.algebra.krylov import cg
from femus_tpu.mesh.generation import unit_box
from femus_tpu.systems.fe_convergence import convergence_study


def test_condest_matches_dense_svd():
    mesh = unit_box((5, 5), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    R, data = jax.jit(asm.make_assemble_fn())(jnp.zeros(asm.n_dofs))
    A = asm.op_with(data)
    sv = np.linalg.svd(np.asarray(A.to_dense()), compute_uv=False)
    want = sv[0] / sv[-1]
    got, smax, smin = cond_2norm(A, iters=60)
    assert abs(smax - sv[0]) / sv[0] < 1e-3, (smax, sv[0])
    assert abs(smin - sv[-1]) / sv[-1] < 1e-3, (smin, sv[-1])
    assert abs(got - want) / want < 3e-3


@pytest.mark.slow
def test_convergence_harness_poisson():
    pi = np.pi

    def exact(x):
        return jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1])

    def exact_grad(x):
        return jnp.stack([pi * jnp.cos(pi * x[:, 0]) * jnp.sin(pi * x[:, 1]),
                          pi * jnp.sin(pi * x[:, 0]) * jnp.cos(pi * x[:, 1])],
                         axis=-1)

    def make_and_solve(ml_mesh):
        from femus_tpu.systems.problem import MultiLevelProblem
        from femus_tpu.systems.solution import MultiLevelSolution
        from femus_tpu.systems.system import LinearImplicitSystem
        ml_sol = MultiLevelSolution(ml_mesh)
        ml_sol.add_solution("u", "serendipity")
        ml_sol.initialize("u")
        ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
        ml_sol.generate_bdc("u")
        prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
        sys = prob.add_system(LinearImplicitSystem, "P")
        sys.add_unknown("u")
        sys.set_assembly(poisson("u", "serendipity",
                                 rhs=lambda x: 2 * pi * pi * exact(x)))
        sys.config.outer = "cg"
        sys.config.rtol = 1e-12
        sys.init()
        sys.solve()
        return ml_sol, {"u": "serendipity"}

    res = convergence_study(make_and_solve, unit_box((3, 3), "quad"), 3,
                            {"u": exact}, {"u": exact_grad})
    assert res.l2_orders["u"][-1] > 2.7, res.report()
    assert res.h1_orders["u"][-1] > 1.8, res.report()
    assert "order" in res.report()
