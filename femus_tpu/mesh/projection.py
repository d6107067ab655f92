"""Inter-mesh FE projection (interpolation) matrices for postprocessing.

Reference: ``fe_projection_matrices_Lagrange_continuous``
(src/06_mesh/00_single_level/01_input/fe_projection_matrices_Lagrange_
continuous.*, SURVEY.md §2.1 FE_Prolongation row) — projection of a solution
between two UNRELATED meshes (no refinement lineage), e.g. sampling a
solution onto a postprocessing grid or transferring between independently
generated discretizations.

Design: each destination dof carrier point is located in the source mesh
with the marker machinery (nearest-centroid + neighbor walk + inverse
isoparametric Newton — particles/markers.locate, the reference's
``Marker::GetElementSerial`` / ``InverseMappingTEST``), then the source
basis is evaluated at the local coordinates: row i of the matrix holds the
source element's shape values.  The matrix is built once on host (setup
time) and applied as an ordinary SpMV.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp

from ..fe.basis import get_basis
from ..fe.geom import GEOMS
from .mesh import Mesh


def projection_matrix(src_mesh: Mesh, src_family: str,
                      dst_mesh: Mesh, dst_family: Optional[str] = None,
                      outside: str = "zero") -> sp.csr_matrix:
    """(n_dst_dofs, n_src_dofs) interpolation matrix between two meshes.

    ``outside``: "zero" leaves rows of destination points that fall outside
    the source mesh empty; "nearest" keeps the nearest element's clamped
    evaluation (the walk's final element).  Lagrange (continuous) families
    only — element-wise (disc) fields have no point values to interpolate.
    """
    import jax
    import jax.numpy as jnp
    from ..particles.markers import MarkerCloud, _inverse_newton, locate

    dst_family = dst_family or src_family
    assert not src_family.startswith("disc"), "Lagrange families only"
    dm_src = src_mesh.dofmap(src_family)
    dm_dst = dst_mesh.dofmap(dst_family)
    pts = dst_mesh.node_coords_of(dst_family)

    cloud = MarkerCloud(src_mesh, np.asarray(pts, np.float64).copy(),
                        np.zeros(len(pts), np.int64))
    locate(cloud)
    elem = cloud.elem
    inside = elem >= 0
    if outside == "zero" and not inside.all():
        pass                      # rows stay empty below
    e_safe = np.maximum(elem, 0)

    g = GEOMS[src_mesh.geom]
    basis = get_basis(src_mesh.geom, src_family)
    geo_conn = src_mesh.conn[:, g.family_nodes["biquadratic"]] \
        if "biquadratic" in g.family_nodes else src_mesh.conn
    coords = jnp.asarray(src_mesh.coords)
    conn_geo = jnp.asarray(geo_conn)
    center = jnp.asarray(g.center, jnp.float64)

    @jax.jit
    def local_phi(xp, e):
        ce = coords[conn_geo[e]]
        xi = _inverse_newton(src_mesh.geom, ce, xp, center, iters=10)
        return basis.eval(xi[None, :], jnp)[0]

    phi = np.asarray(jax.vmap(local_phi)(jnp.asarray(cloud.x),
                                         jnp.asarray(e_safe)))
    nd = phi.shape[1]
    rows = np.repeat(np.arange(dm_dst.n_dofs), nd)
    cols = dm_src.conn[e_safe].ravel()
    vals = phi.ravel()
    if outside == "zero":
        keep = np.repeat(inside, nd)
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
    M = sp.csr_matrix((vals, (rows, cols)),
                      shape=(dm_dst.n_dofs, dm_src.n_dofs))
    M.sum_duplicates()
    M.eliminate_zeros()
    return M


def project(src_mesh: Mesh, src_family: str, values: np.ndarray,
            dst_mesh: Mesh, dst_family: Optional[str] = None,
            outside: str = "zero") -> np.ndarray:
    """Interpolate a nodal field onto another mesh's dof carriers."""
    M = projection_matrix(src_mesh, src_family, dst_mesh, dst_family,
                          outside=outside)
    return np.asarray(M @ np.asarray(values))
