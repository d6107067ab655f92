"""SALOME .med (HDF5) reader tests against the reference's own mesh files
(data only; skipped when the reference tree is not mounted)."""
import glob
import os

import numpy as np
import pytest

from femus_tpu.mesh.med import read_med

REF = ("/root/reference/src/06_mesh/00_single_level/01_input/00_mesh_files/"
       "00_salome")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference meshes not mounted")


def mesh_volume(mesh):
    from femus_tpu.fe.basis import get_basis
    from femus_tpu.fe.quadrature import gauss
    b = get_basis(mesh.geom, "biquadratic")
    pts, w = gauss(mesh.geom, 4)
    dphi = b.eval_grad(pts)
    c = mesh.coords[mesh.conn]
    J = np.einsum("qnd,enx->eqdx", dphi, c)
    return float((np.abs(np.linalg.det(J)) * w[None, :]).sum())


def jac_positive(mesh):
    """Geometric map orientation at all biquadratic nodes of all elements."""
    from femus_tpu.fe.basis import get_basis
    from femus_tpu.fe.geom import GEOMS
    b = get_basis(mesh.geom, "biquadratic")
    pts = GEOMS[mesh.geom].ref_nodes
    dphi = b.eval_grad(pts)
    c = mesh.coords[mesh.conn]
    J = np.einsum("qnd,enx->eqdx", dphi, c)
    return np.linalg.det(J)


def test_hex27_unit_cube():
    p = (REF + "/3d/cube/0-1x0-1x0-1/"
         "cube_01x01x01_Hex27_One_boundaries_groups.med")
    m = read_med(p)
    assert m.geom == "hex" and m.n_elems == 1 and m.n_nodes == 27
    assert np.isclose(mesh_volume(m), 1.0)
    assert np.all(jac_positive(m) > 0)
    # center node is the centroid
    assert np.allclose(m.coords[m.conn[0, 26]], [0.5, 0.5, 0.5])
    # boundary groups labeled from FAS names Group_1/2/9_*
    groups = set()
    for bf in m.boundary.values():
        groups.update(bf.group.tolist())
    assert groups <= {1, 2, 3, 9} and len(groups) >= 1


def test_2d_files_readable():
    files = sorted(glob.glob(REF + "/2d/**/*.med", recursive=True))
    assert files
    ok = 0
    for p in files[:8]:
        try:
            m = read_med(p)
        except NotImplementedError:
            continue
        assert m.dim == 2 and m.n_elems > 0
        assert np.all(jac_positive(m) > 0), p
        assert mesh_volume(m) > 0
        ok += 1
    assert ok >= 3


def test_tet_cylinder():
    p = REF + "/3d/cylinder/assignment_cylinder_tetrahedral.med"
    m = read_med(p)
    assert m.geom == "tet"
    assert np.all(jac_positive(m) > 0)
    assert mesh_volume(m) > 0


def test_wedge_biquadratic():
    p = REF + "/3d/wedge/wedge_biq.med"
    m = read_med(p)
    assert m.geom == "wedge"
    assert np.all(jac_positive(m) > 0)


def test_lower_order_completion():
    """HE8/QU4-style files are completed to biquadratic connectivity."""
    files = sorted(glob.glob(REF + "/**/*.med", recursive=True))
    from femus_tpu.fe.geom import GEOMS
    done = 0
    for p in files:
        try:
            m = read_med(p)
        except (NotImplementedError, KeyError, OSError):
            continue
        assert m.conn.shape[1] == GEOMS[m.geom].n_nodes_bq, p
        done += 1
        if done > 12:
            break
    assert done >= 5
