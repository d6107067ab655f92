"""Steady lid-driven cavity: Newton on Q2/Q1 Navier-Stokes + VTK output.

Reference: applications/000_tutorial/ex06* / 003_NavierStokes
(AssembleNavierStokes_AD weak form, 03_navier_stokes.hpp:339-360).
"""
import os

import _common  # noqa: F401
import numpy as np

from femus_tpu.assembly.forms import navier_stokes
from femus_tpu.io.vtk import write_vtu
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.problem import MultiLevelProblem
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.systems.system import NonLinearImplicitSystem
from femus_tpu.utils.telemetry import convergence_table


def bc(var, x, grp, t):
    if var == "p":
        return False, 0.0
    if var == "u" and abs(x[1] - 1.0) < 1e-9:
        return True, 1.0                      # moving lid
    return True, 0.0


def main():
    n = int(os.environ.get("EX_N", "16"))
    ml_mesh = MultiLevelMesh(unit_box((n, n), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic")
    ml_sol.add_solution("v", "biquadratic")
    ml_sol.add_solution("p", "linear")
    for v in ("u", "v", "p"):
        ml_sol.initialize(v)
    ml_sol.attach_bc(bc)
    ml_sol.generate_bdc("u", "v", "p")
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(NonLinearImplicitSystem, "NS")
    sys.add_unknown("u", "v", "p")
    sys.set_assembly(navier_stokes(("u", "v"), "p", nu=0.01))  # Re = 100
    sys.config.outer = "gmres"
    sys.config.rtol = 1e-10
    sys.config.max_nonlinear = 15
    sys.config.nonlinear_tol = 1e-9
    sys.init()
    sys.solve()
    print(convergence_table(sys.history))
    mesh = ml_mesh.finest()
    out = write_vtu(os.environ.get("EX_OUT", "/tmp/cavity.vtu"), mesh,
                    point_data={v: np.asarray(ml_sol.sol[-1][v])
                                for v in ("u", "v")})
    print("max |u| =", float(np.abs(ml_sol.sol[-1]["u"]).max()),
          " wrote", out)


if __name__ == "__main__":
    main()
