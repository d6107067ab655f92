"""Neumann boundary optimal control (reference 00_cost_functional.hpp:27-53
boundary integrals; 010_OptimalControl Neumann-control variants).

min 1/2||y - y_d||^2 + alpha/2||u||^2_{L2(Gc)} s.t. -lap y = f,
dy/dn = u on the control boundary.  Verified against the unreduced
optimality system solved by a direct sparse LU.
"""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla
import jax.numpy as jnp

from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.systems.system import NonLinearImplicitSystem
from femus_tpu.systems.optimal_control import (boundary_control_forms,
                                               fix_interior_control)

pi = np.pi
ALPHA = 1e-2
CTRL_GROUP = 2          # x = 1 face of the generated box (BOX_GROUPS)


def y_target(x):
    return jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1])


def bc(var, x, grp, t):
    # state and adjoint: Dirichlet 0 except the control boundary (Neumann);
    # control: never Dirichlet from faces (interior fixed separately)
    if var in ("y", "l"):
        return (grp != CTRL_GROUP), 0.0
    return False, 0.0


def _build(n=8):
    ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    for v in ("y", "l", "u"):
        ml_sol.add_solution(v, "biquadratic")
        ml_sol.initialize(v)
    ml_sol.attach_bc(bc)
    ml_sol.generate_bdc("y", "l", "u")
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(NonLinearImplicitSystem, "boundary-control")
    sys.add_unknown("y", "l", "u")
    vol, face = boundary_control_forms(
        y_target=y_target, alpha=ALPHA, control_groups=(CTRL_GROUP,))
    sys.set_assembly(vol, face)
    sys.config.use_mg = False
    sys.config.restart = 200
    sys.config.max_outer = 20
    sys.config.rtol = 1e-11
    sys.init()
    fix_interior_control(sys, "u", (CTRL_GROUP,))
    return prob, sys


@pytest.mark.slow
def test_boundary_control_kkt_matches_lu():
    prob, sys = _build()
    sys.solve()
    ml_sol = prob.ml_sol
    a = sys.assemblers[-1]
    from femus_tpu.assembly.bc import apply_dirichlet_values
    assemble = a.make_assemble_fn()
    u = jnp.asarray(apply_dirichlet_values(a, np.zeros(a.n_dofs)))
    R, data = assemble(u)
    w = a.pattern.width
    rows = np.repeat(np.arange(a.pattern.n_rows), w)
    cols = np.asarray(a.pattern.cols).ravel()
    vals = np.asarray(data).ravel()
    valid = np.asarray(a.pattern.valid).ravel()
    J = sp.csr_matrix((vals[valid], (rows[valid], cols[valid])),
                      shape=(a.pattern.n_rows, a.pattern.n_rows))
    ref = np.asarray(u)[:a.n_dofs] - spla.spsolve(
        J[:a.n_dofs, :a.n_dofs].tocsc(), np.asarray(R)[:a.n_dofs])

    got = sys.gather(-1)
    assert np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1) < 1e-8

    # the control actually acts: state tracks the target better than the
    # uncontrolled solve, and the control lives on the boundary only
    nu = ml_sol.n_dofs("u", -1)
    off = a.offsets["u"]
    uc = got[off:off + nu]
    assert np.abs(uc).max() > 1e-3            # nontrivial boundary control
    dm = a.dofmaps["u"]
    mesh = prob.ml_mesh.finest()
    on_gc = np.abs(mesh.coords[dm.nodes][:, 0] - 1.0) < 1e-12
    assert np.abs(uc[~on_gc]).max() < 1e-14   # interior dofs eliminated

    # optimality: gradient row alpha*u - l = 0 on the control boundary
    lc = got[a.offsets["l"]:a.offsets["l"] + nu]
    g = ALPHA * uc[on_gc] - lc[on_gc]
    # weak-form identity only up to the boundary mass matrix: compare norms
    assert np.linalg.norm(g) < 1e-6 * max(1.0, np.linalg.norm(lc))
