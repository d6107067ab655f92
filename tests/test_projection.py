"""Inter-mesh FE projection (mesh/projection.py; reference
fe_projection_matrices_Lagrange_continuous): interpolation between two
UNRELATED meshes — exact on polynomials in the source space, accurate on
smooth fields, empty rows outside the source domain."""
import numpy as np
import pytest

from femus_tpu.mesh.generation import box, unit_box
from femus_tpu.mesh.projection import project, projection_matrix


def test_projection_exact_on_polynomials():
    src = unit_box((7, 5), "quad")
    dst = unit_box((4, 9), "quad")
    xy = src.node_coords_of("biquadratic")
    # biquadratic source space contains x^2 y^2 terms
    f = 1.0 + 2 * xy[:, 0] - xy[:, 1] + 3 * xy[:, 0] ** 2 * xy[:, 1] ** 2
    got = project(src, "biquadratic", f, dst)
    xd = dst.node_coords_of("biquadratic")
    want = 1.0 + 2 * xd[:, 0] - xd[:, 1] + 3 * xd[:, 0] ** 2 * xd[:, 1] ** 2
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_projection_cross_family_and_rows():
    src = unit_box((6, 6), "quad")
    dst = unit_box((5, 5), "quad")
    M = projection_matrix(src, "biquadratic", dst, "linear")
    dmd = dst.dofmap("linear")
    assert M.shape == (dmd.n_dofs, src.dofmap("biquadratic").n_dofs)
    # interpolation rows are partitions of unity
    np.testing.assert_allclose(np.asarray(M.sum(axis=1)).ravel(), 1.0,
                               atol=1e-9)


def test_projection_outside_rows_are_zero():
    src = unit_box((4, 4), "quad")                      # [0,1]^2
    dst = box((4, 4), [(0.5, 1.5), (0.0, 1.0)], "quad")  # half outside
    M = projection_matrix(src, "biquadratic", dst)
    xd = dst.node_coords_of("biquadratic")
    out = xd[:, 0] > 1.0 + 1e-9
    rowsum = np.asarray(M.sum(axis=1)).ravel()
    assert np.abs(rowsum[out]).max() < 1e-12
    np.testing.assert_allclose(rowsum[~out], 1.0, atol=1e-7)


def test_projection_3d():
    src = unit_box((3, 3, 3), "hex")
    dst = unit_box((2, 4, 2), "hex")
    xyz = src.node_coords_of("biquadratic")
    f = xyz[:, 0] * xyz[:, 1] + xyz[:, 2] ** 2
    got = project(src, "biquadratic", f, dst)
    xd = dst.node_coords_of("biquadratic")
    np.testing.assert_allclose(got, xd[:, 0] * xd[:, 1] + xd[:, 2] ** 2,
                               atol=1e-8)
