"""3-D monolithic steady FSI: lid-driven cavity over an elastic bottom bed
on a hex mesh (reference: the 3-D benchmarks of applications/005_FSI, e.g.
the richards/turek 3-D mains, with PairSolution("U","DX")/("V","DY")/
("W","DZ") — fsiSteadyMG.cpp:252-254).

Gates (geometry differs from the reference apps, so structure is asserted,
not norms):
- zero lid forcing -> zero solution (quick);
- the 2-level F-cycle Newton through the OWN MG solver — material-split
  Vanka smoothers + the FSI Petrov-Galerkin _RR restriction with 3-D
  pairing + R A P coarse operators — matches the direct-LU Newton solution
  of the same discretization (slow).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.fsi import MonolithicFSISystem, fsi_steady_form
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution

DISP = ("dx", "dy", "dz")
VEL = ("u", "v", "w")


def make_fsi3d(n=2, levels=1, lid=0.2, use_mg=False):
    coarse = unit_box((n, n, n), "hex")
    # solid = bottom element layer (z < 1/n), fluid above
    cent = coarse.coords[coarse.conn].mean(axis=1)
    coarse.elem_group = np.where(cent[:, 2] < 1.0 / n, 1, 0).astype(np.int32)
    ml_mesh = MultiLevelMesh(coarse, levels)
    ml_sol = MultiLevelSolution(ml_mesh)
    for v in DISP + VEL:
        ml_sol.add_solution(v, "biquadratic")
    # discontinuous P1 pressure, like the reference FSI gate
    # (testFSISteady main.cpp:66 AddSolution("P", DISCONTINUOUS_POLYNOMIAL,
    # FIRST) — element-patch Vanka blocks contain the full pressure support;
    # continuous pressure would leak support outside the patches and
    # destabilize the block sweeps)
    ml_sol.add_solution("p", "disc_linear")

    def bc(var, x, grp, t):
        if var == "p":
            return False, 0.0
        if var in DISP:
            return True, 0.0                    # clamp mesh/solid on borders
        if var == "u" and x[2] > 1.0 - 1e-9:
            return True, lid                    # moving lid on top (z = 1)
        return True, 0.0                        # no-slip elsewhere

    ml_sol.attach_bc(bc)
    for v in DISP + VEL + ("p",):
        ml_sol.initialize(v)
    ml_sol.generate_bdc()
    ml_sol.fix_solution_at_point("p", 0, 0.0)
    # reference 3-D pairing: PairSolution("U","DX")... ("W","DZ")
    for vv, dd in zip(VEL, DISP):
        ml_sol.pair_solution(vv, dd)
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(MonolithicFSISystem, "FSI3D")
    sys.solid_groups = (1,)
    sys.add_unknown(*DISP, *VEL, "p")
    sys.set_assembly(fsi_steady_form(
        DISP, VEL, "p", pres_family="disc_linear", solid_groups=(1,),
        nu=0.5, lam=10.0, mu=5.0, solid_model="neo-hookean"))
    cfg = sys.config
    cfg.outer = "gmres"
    cfg.use_mg = use_mg
    if use_mg:
        cfg.smoother = "vanka"
        cfg.vanka_groups = "material"
        cfg.mg_type = "F"
        cfg.restart = 60
        cfg.max_outer = 10
    else:
        cfg.restart = 150
        cfg.max_outer = 30
    cfg.rtol = 1e-11
    cfg.nonlinear_tol = 1e-9
    sys.init()
    return prob, sys


def test_fsi3d_zero_forcing_zero_solution():
    prob, sys = make_fsi3d(2, lid=0.0)
    sys.solve()
    for v in DISP + VEL:
        assert np.abs(prob.ml_sol.sol[-1][v]).max() < 1e-9, v


@pytest.mark.slow
def test_fsi3d_mg_matches_lu_two_levels():
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    prob, sys = make_fsi3d(2, levels=2, lid=0.2, use_mg=True)
    sys.solve()
    eps = [max(h["eps"].values()) for h in sys.history if h["level"] == 1]
    assert eps[-1] < 1e-8, eps
    u_mg = np.asarray(sys.gather(-1))

    # direct-LU Newton on the identical fine discretization
    prob2, sys2 = make_fsi3d(2, levels=2, lid=0.2, use_mg=False)
    a = sys2.assemblers[-1]
    assemble = jax.jit(a.make_assemble_fn(pass_tables=True))
    tabs = a.device_tables_cached()
    u = jnp.asarray(sys2.gather(-1))
    pat = a.pattern
    w = pat.width
    rows = np.repeat(np.arange(pat.n_rows), w)
    valid = np.asarray(pat.valid).ravel()
    cols = np.asarray(pat.cols).ravel()
    for _ in range(12):
        R, data = assemble(u, tabs, {}, {})
        vals = np.asarray(data).ravel()
        A = sp.csr_matrix((vals[valid], (rows[valid], cols[valid])),
                          shape=(pat.n_rows, pat.n_cols))
        delta = spla.splu(A.tocsc()).solve(-np.asarray(R))
        u = u + jnp.asarray(delta)
        if np.linalg.norm(delta) / max(np.linalg.norm(np.asarray(u)),
                                       1e-30) < 1e-12:
            break
    u_lu = np.asarray(u)

    for k, off in sys.assemblers[-1].offsets.items():
        nd = sys.assemblers[-1].dofmaps[k].n_dofs
        n_mg = np.linalg.norm(u_mg[off:off + nd])
        n_lu = np.linalg.norm(u_lu[off:off + nd])
        assert n_mg == pytest.approx(n_lu, rel=1e-6, abs=1e-9), (k, n_mg, n_lu)

    # physics structure: fluid moves, solid surface shears, fields finite
    sol = prob.ml_sol.sol[-1]
    assert all(np.isfinite(sol[v]).all() for v in sol)
    assert np.abs(sol["u"]).max() > 0.05
    mesh = prob.ml_mesh.finest()
    dm = mesh.dofmap("biquadratic")
    xyz = mesh.coords[dm.nodes]
    interface = np.isclose(xyz[:, 2], 0.5)
    assert interface.sum() > 0
    assert np.abs(sol["dx"][interface]).max() > 1e-8
