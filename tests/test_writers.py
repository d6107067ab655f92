"""GMV / XDMF writer tests (round-trip through our own minimal readers) and
the Writer factory (reference Writer.hpp:44 build over {VTK, GMV, XDMF})."""
import glob
import os

import numpy as np
import pytest

from femus_tpu.io import build_writer
from femus_tpu.io.gmv import read_gmv, write_gmv
from femus_tpu.io.xdmf import read_xdmf_h5, write_xdmf
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.solution import MultiLevelSolution


def _ml_sol(geom="quad", n=(3, 3)):
    mesh = unit_box(n, geom)
    ml = MultiLevelMesh(mesh, n_levels=1)
    sol = MultiLevelSolution(ml)
    sol.add_solution("u", "biquadratic")
    sol.initialize("u", lambda x: np.sin(x[:, 0]) * np.cos(x[:, 1]))
    sol.add_solution("p", "disc_constant")
    sol.initialize("p", lambda x: x[:, 0])
    return sol


def test_gmv_roundtrip(tmp_path):
    sol = _ml_sol()
    mesh = sol.ml_mesh.levels[0]
    from femus_tpu.io.vtk import nodal_field
    pd = {"u": nodal_field(mesh, "biquadratic", sol.sol[0]["u"])}
    cd = {"p": sol.sol[0]["p"]}
    path = write_gmv(str(tmp_path / "out.gmv"), mesh, point_data=pd,
                     cell_data=cd, order="quadratic")
    coords, conn, pd2, cd2 = read_gmv(path)
    assert coords.shape[0] == mesh.n_nodes
    assert np.allclose(coords[:, :2], mesh.coords)
    assert conn.shape == (mesh.n_elems, 8)          # quadratic quad8
    assert np.array_equal(conn, mesh.conn[:, :8])
    assert np.allclose(pd2["u"], pd["u"])
    assert np.allclose(cd2["p"], cd["p"])
    # linear order picks the corner subset
    path = write_gmv(str(tmp_path / "lin.gmv"), mesh, order="linear")
    _, conn_l, _, _ = read_gmv(path)
    assert conn_l.shape == (mesh.n_elems, 4)


def test_gmv_3d(tmp_path):
    mesh = unit_box((2, 2, 2), "hex")
    path = write_gmv(str(tmp_path / "h.gmv"), mesh)
    coords, conn, _, _ = read_gmv(path)
    assert conn.shape == (8, 20)                    # phex20
    assert coords.shape == (mesh.n_nodes, 3)


def test_xdmf_roundtrip(tmp_path):
    sol = _ml_sol()
    mesh = sol.ml_mesh.levels[0]
    from femus_tpu.io.vtk import nodal_field
    pd = {"u": nodal_field(mesh, "biquadratic", sol.sol[0]["u"])}
    path = write_xdmf(str(tmp_path / "out.xmf"), mesh, point_data=pd,
                      order="biquadratic")
    assert os.path.exists(path)
    xml = open(path).read()
    assert "Quadrilateral_9" in xml and 'Name="u"' in xml
    data = read_xdmf_h5(path)["mesh0"]
    assert np.allclose(data["coords"][:, :2], mesh.coords)
    assert data["connectivity"].shape == (mesh.n_elems, 9)
    assert np.allclose(data["u"], pd["u"])


def test_xdmf_time_series(tmp_path):
    sol = _ml_sol()
    w = build_writer("xdmf", sol)
    for k, t in enumerate([0.0, 0.5, 1.0]):
        sol.sol[0]["u"][:] = t
        w.write_series(str(tmp_path), "u", time=t)
    xml = open(tmp_path / "series.xmf").read()
    assert xml.count("<Grid Name=\"t") == 3
    assert 'Value="0.5"' in xml
    data = read_xdmf_h5(str(tmp_path / "series"))
    assert np.allclose(data["t00002"]["u"], 1.0)


def test_writer_factory(tmp_path):
    sol = _ml_sol()
    for kind, suffix in (("vtk", ".vtu"), ("gmv", ".gmv"), ("xdmf", ".xmf")):
        w = build_writer(kind, sol)
        path = w.write(str(tmp_path / kind))
        assert path.endswith(suffix) and os.path.exists(path)
    with pytest.raises(ValueError):
        build_writer("nope", sol)


def test_parallel_vtu_pieces(tmp_path):
    """Sharded output: per-shard .vtu pieces + master .pvtu
    (VTKWriter.cpp:459-500 per-rank analogue)."""
    import base64
    import struct

    import numpy as np
    from femus_tpu.io.vtk import write_parallel, nodal_field
    from femus_tpu.mesh.generation import unit_box
    from femus_tpu.parallel.partition import partition_mesh

    mesh, info = partition_mesh(unit_box((6, 6), "quad"), 4, method="rcb")
    u = mesh.coords[:, 0] + 2.0 * mesh.coords[:, 1]     # nodal linear field
    pvtu = write_parallel(str(tmp_path / "out"), mesh, info.elem_shard,
                          point_data={"u": u})
    txt = (tmp_path / "out.pvtu").read_text()
    assert txt.count("<Piece") == 4 and 'Name="u"' in txt

    # pieces partition the element set and carry exact nodal values
    total_cells = 0
    for s in range(4):
        piece = (tmp_path / f"out_{s:04d}.vtu").read_text()
        n_cells = int(piece.split('NumberOfCells="')[1].split('"')[0])
        n_pts = int(piece.split('NumberOfPoints="')[1].split('"')[0])
        total_cells += n_cells
        # decode the Points payload and check u = x + 2y pointwise
        def payload(name):
            blob = piece.split(f'Name="{name}"')[1].split(">\n")[1].split("\n")[0]
            raw = base64.b64decode(blob)
            (nbytes,) = struct.unpack("<I", raw[:4])
            return np.frombuffer(raw[4:4 + nbytes], np.float32)
        pts = payload("Points").reshape(n_pts, 3)
        uv = payload("u")
        assert np.allclose(uv, pts[:, 0] + 2 * pts[:, 1], atol=1e-6)
    assert total_cells == mesh.n_elems
