"""Equivalent of the reference regression executable
``unittests/test_mesh_read_write`` (test_mesh_read_write.cpp): read the same
SALOME .med mesh, refine, add one solution per FE family (all five,
FElemTypeEnum_list.hpp:10-24), initialize with u = x[0]
(Solution_set_initial_conditions, :44-67), and write every output format."""
import os

import numpy as np
import pytest

from femus_tpu.io.gmv import write_gmv
from femus_tpu.io.vtk import write_vtu
from femus_tpu.io.xdmf import write_xdmf
from femus_tpu.mesh.med import read_med
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.solution import MultiLevelSolution

MED = ("/root/reference/src/06_mesh/00_single_level/01_input/00_mesh_files/"
       "00_salome/2d/square/0-1x0-1/square_0-1x0-1_divisions_2x2.med")

FAMILIES = {
    "u_lag_first": "linear",
    "u_lag_serendip": "serendipity",
    "u_lag_second": "biquadratic",
    "u_disc_zero": "disc_constant",
    "u_disc_first": "disc_linear",
}


@pytest.mark.skipif(not os.path.exists(MED), reason="reference mesh absent")
def test_mesh_read_write(tmp_path):
    mesh = read_med(MED)
    ml_mesh = MultiLevelMesh(mesh, 2)
    ml_sol = MultiLevelSolution(ml_mesh)
    for name, fam in FAMILIES.items():
        ml_sol.add_solution(name, fam)
        ml_sol.initialize(name, lambda x: x[:, 0])

    fine = ml_mesh.finest()
    for name, fam in FAMILIES.items():
        vals = ml_sol.sol[-1][name]
        assert np.isfinite(vals).all()
        if fam in ("linear", "serendipity", "biquadratic"):
            xs = fine.coords[fine.dofmap(fam).nodes][:, 0]
            np.testing.assert_allclose(vals, xs, atol=1e-12)
        assert vals.min() >= -1e-12 and vals.max() <= 1.0 + 1e-12

    # write in all three formats (reference loops over writers, :216-240)
    pd = {n: np.asarray(ml_sol.sol[-1][n])
          for n, f in FAMILIES.items()
          if f in ("linear", "serendipity", "biquadratic")}
    p1 = write_vtu(str(tmp_path / "out.vtu"), fine, point_data=pd)
    p2 = write_gmv(str(tmp_path / "out.gmv"), fine, point_data=pd)
    p3 = write_xdmf(str(tmp_path / "out.xmf"), fine, point_data=pd)
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 0
