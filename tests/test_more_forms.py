"""Biharmonic coupled system and nonlinear degenerate diffusion (tutorial
ex04/ex05 and 091_Tumor analogues)."""
import numpy as np
import pytest
import jax.numpy as jnp

from femus_tpu.assembly.forms import biharmonic_coupled, nonlinear_diffusion
from femus_tpu.assembly.norms import error_norms
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.systems.system import LinearImplicitSystem, NonLinearImplicitSystem

pi = np.pi


def test_biharmonic_coupled_convergence():
    def exact(x):
        return jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1])

    errs = []
    for n in (4, 8):
        ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 1)
        ml_sol = MultiLevelSolution(ml_mesh)
        ml_sol.add_solution("u", "biquadratic")
        ml_sol.add_solution("v", "biquadratic")
        ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
        for w in ("u", "v"):
            ml_sol.initialize(w)
        ml_sol.generate_bdc()
        prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
        sys = prob.add_system(LinearImplicitSystem, "BH")
        sys.add_unknown("u", "v")
        sys.set_assembly(biharmonic_coupled(
            rhs=lambda x: 4 * pi ** 4 * exact(x)))
        sys.config.outer = "gmres"
        sys.config.use_mg = False
        sys.config.restart = 100
        sys.config.max_outer = 40
        sys.config.rtol = 1e-12
        sys.init()
        sys.solve()
        l2, _ = error_norms(ml_mesh.finest(), "biquadratic",
                            jnp.asarray(ml_sol.sol[-1]["u"]), exact)
        errs.append(l2)
        # v = -lap u = 2 pi^2 u
        l2v, _ = error_norms(ml_mesh.finest(), "biquadratic",
                             jnp.asarray(ml_sol.sol[-1]["v"]),
                             lambda x: 2 * pi ** 2 * exact(x))
        assert l2v / (2 * pi ** 2) < 10 * l2 + 1e-3
    assert np.log2(errs[0] / errs[1]) > 2.3, errs


def test_nonlinear_degenerate_diffusion():
    """u_t-free steady: -div((eps + u^2) grad u) = f with manufactured
    solution (091_Tumor-type operator); Newton converges, order ~3."""
    def exact(x):
        return jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1])

    a = lambda s: 0.1 + s * s

    def rhs(x):
        import jax
        def one(xx, yy):
            f = lambda p, q: jnp.sin(pi * p) * jnp.sin(pi * q)
            def flux_x(p, q):
                return a(f(p, q)) * jax.grad(f, 0)(p, q)
            def flux_y(p, q):
                return a(f(p, q)) * jax.grad(f, 1)(p, q)
            return -(jax.grad(flux_x, 0)(xx, yy) + jax.grad(flux_y, 1)(xx, yy))
        import jax
        return jax.vmap(one)(x[:, 0], x[:, 1])

    errs = []
    for n in (4, 8):
        ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 1)
        ml_sol = MultiLevelSolution(ml_mesh)
        ml_sol.add_solution("u", "biquadratic")
        ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
        ml_sol.initialize("u")
        ml_sol.generate_bdc()
        prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="seventh")
        sys = prob.add_system(NonLinearImplicitSystem, "Tumor")
        sys.add_unknown("u")
        sys.set_assembly(nonlinear_diffusion("u", a=a, rhs=rhs))
        sys.config.outer = "gmres"
        sys.config.use_mg = False
        sys.config.rtol = 1e-12
        sys.config.nonlinear_tol = 1e-11
        sys.init()
        sys.solve()
        l2, _ = error_norms(ml_mesh.finest(), "biquadratic",
                            jnp.asarray(ml_sol.sol[-1]["u"]), exact)
        errs.append(l2)
    assert np.log2(errs[0] / errs[1]) > 2.5, errs
