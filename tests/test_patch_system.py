"""Patch-stencil operator through the System/MG solve path
(SolverConfig.operator = "patch", rediscretized coarse hierarchy)."""
import numpy as np
import pytest
import jax.numpy as jnp

from femus_tpu.assembly.forms import poisson
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import PatchedMultiLevelMesh
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.systems.system import LinearImplicitSystem

pi = np.pi


def exact(x):
    return jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1])


@pytest.mark.slow
def test_patch3d_operator_mg_solve():
    """Same MG drive with the 3-D hex patch operator (slow: the 3-D patch
    machinery compile dominates; the quick tier keeps the 2-D MG drive and
    the 3-D patch matvec equivalences in test_patchstencil3d)."""
    ml_mesh = PatchedMultiLevelMesh(unit_box((2, 2, 2), "hex"), 2)
    assert ml_mesh.levels[1].patch_plan is not None
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic")
    ml_sol.initialize("u")
    ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
    ml_sol.generate_bdc("u")
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(LinearImplicitSystem, "poisson-patch3d")
    sys.add_unknown("u")

    def exact3(x):
        return (jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1])
                * jnp.sin(pi * x[:, 2]))

    sys.set_assembly(poisson("u", "biquadratic", rhs=lambda x: (
        3 * pi ** 2 * exact3(x))))
    cfg = sys.config
    cfg.operator = "patch"
    cfg.coarse_op = "rediscretize"
    cfg.smoother = "chebyshev"
    cfg.mg_type = "V"
    cfg.rtol = 1e-10
    sys.init()
    out = sys.solve()
    assert out["iters"] <= 12, out
    u = ml_sol.sol[-1]["u"]
    x = ml_mesh.levels[-1].node_coords_of("biquadratic")
    err = np.abs(u - np.asarray(exact3(jnp.asarray(x)))).max()
    assert err < 5e-3, err      # coarse 8x8x8-element Q2 mesh


def test_patch_operator_mg_solve():
    ml_mesh = PatchedMultiLevelMesh(unit_box((3, 3), "quad"), 3)
    assert ml_mesh.levels[1].patch_plan is not None
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic")
    ml_sol.initialize("u")
    ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
    ml_sol.generate_bdc("u")
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(LinearImplicitSystem, "poisson-patch")
    sys.add_unknown("u")
    sys.set_assembly(poisson("u", "biquadratic", rhs=lambda x: (
        2 * pi ** 2 * exact(x))))
    cfg = sys.config
    cfg.operator = "patch"
    cfg.coarse_op = "rediscretize"
    cfg.smoother = "chebyshev"
    cfg.mg_type = "V"
    cfg.rtol = 1e-10
    sys.init()
    out = sys.solve()

    # MG behaves: few preconditioned-GMRES iterations at 1e-10
    assert out["iters"] <= 12, out
    u = ml_sol.sol[-1]["u"]
    x = ml_mesh.levels[-1].node_coords_of("biquadratic")
    err = np.abs(u - np.asarray(exact(jnp.asarray(x)))).max()
    assert err < 2e-5, err
