"""Monolithic steady FSI: lid-driven fluid over an elastic solid block.
Gates: Newton converges, interface displacement is continuous and nonzero,
zero-forcing problem yields the zero solution (reference testFSISteady is the
golden-value analogue; geometry differs so we assert structure, not norms)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.fsi import MonolithicFSISystem, fsi_steady_form
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution


def make_fsi(n=6, lid=0.2):
    coarse = unit_box((n, n), "quad")
    # solid = bottom strip y < 1/n (one element row), fluid above
    cent = coarse.coords[coarse.conn].mean(axis=1)
    coarse.elem_group = np.where(cent[:, 1] < 1.0 / n, 1, 0).astype(np.int32)
    ml_mesh = MultiLevelMesh(coarse, 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    for v in ("dx", "dy", "u", "v"):
        ml_sol.add_solution(v, "biquadratic")
    ml_sol.add_solution("p", "linear")

    def bc(var, x, grp, t):
        if var == "p":
            return False, 0.0
        if var in ("dx", "dy"):
            return True, 0.0                     # clamp mesh/solid on borders
        if var == "u" and grp == 4:
            return True, lid                     # moving lid on top
        return True, 0.0                         # no-slip elsewhere

    ml_sol.attach_bc(bc)
    for v in ("dx", "dy", "u", "v", "p"):
        ml_sol.initialize(v)
    ml_sol.generate_bdc()
    ml_sol.fix_solution_at_point("p", 0, 0.0)
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(MonolithicFSISystem, "FSI")
    sys.add_unknown("dx", "dy", "u", "v", "p")
    sys.set_assembly(fsi_steady_form(
        ("dx", "dy"), ("u", "v"), "p", solid_groups=(1,),
        nu=0.5, lam=10.0, mu=5.0, solid_model="neo-hookean"))
    sys.config.outer = "gmres"
    sys.config.use_mg = False
    sys.config.restart = 150
    sys.config.max_outer = 30
    sys.config.rtol = 1e-11
    sys.config.nonlinear_tol = 1e-9
    sys.init()
    return prob, sys


def test_fsi_zero_forcing_zero_solution():
    prob, sys = make_fsi(4, lid=0.0)
    sys.solve()
    for v in ("dx", "dy", "u", "v"):
        assert np.abs(prob.ml_sol.sol[-1][v]).max() < 1e-9, v


def test_fsi_lid_driven_over_elastic_bed():
    prob, sys = make_fsi(6, lid=0.2)
    sys.solve()
    eps = [max(h["eps"].values()) for h in sys.history]
    assert eps[-1] < 1e-8, eps
    sol = prob.ml_sol.sol[-1]
    mesh = prob.ml_mesh.finest()
    assert all(np.isfinite(sol[v]).all() for v in sol)
    # fluid moves
    assert np.abs(sol["u"]).max() > 0.1
    # solid deforms (shear traction from the flow drags the bed): dx nonzero
    # at interface nodes (y = 1/6 line)
    dm = mesh.dofmap("biquadratic")
    xy = mesh.coords[dm.nodes]
    interface = np.isclose(xy[:, 1], 1.0 / 6.0)
    assert interface.sum() > 0
    assert np.abs(sol["dx"][interface]).max() > 1e-7
    # velocity is ~0 strictly inside the solid (y < 1/12)
    inside = xy[:, 1] < 1.0 / 24.0
    inner = inside & (xy[:, 0] > 0.2) & (xy[:, 0] < 0.8) & (xy[:, 1] > 1e-9)
    if inner.sum():
        assert np.abs(sol["u"][inner]).max() < 1e-6
