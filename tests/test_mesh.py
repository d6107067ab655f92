"""Mesh layer tests: generation, boundary faces, dofmaps, refinement,
prolongation blocks (reference analogues: MeshGeneration, MeshRefinement,
fe_prolongation_matrices, Mesh dof maps — SURVEY.md §2.1)."""
import numpy as np
import pytest

from femus_tpu.fe.basis import get_basis
from femus_tpu.fe.geom import GEOMS
from femus_tpu.fe.quadrature import gauss
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.mesh import boundary_node_groups
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.mesh.refine import local_prolongation, refine


def mesh_volume(mesh):
    b = get_basis(mesh.geom, "biquadratic")
    pts, w = gauss(mesh.geom, 4)
    dphi = b.eval_grad(pts)                     # (nq, nd, dim)
    c = mesh.coords[mesh.conn]                  # (ne, nd, dim)
    J = np.einsum("qnd,enx->eqdx", dphi, c)
    det = np.abs(np.linalg.det(J))
    return float((det * w[None, :]).sum())


CASES = [("edge", (4,)), ("quad", (3, 2)), ("tri", (3, 2)),
         ("hex", (2, 2, 2)), ("tet", (2, 2, 2)), ("wedge", (2, 2, 2))]


@pytest.mark.parametrize("geom,ns", CASES)
def test_box_volume_and_boundary(geom, ns):
    m = unit_box(ns, geom)
    assert np.isclose(mesh_volume(m), 1.0, rtol=1e-12)
    # boundary faces must cover the full surface: sum of face measures
    dim = len(ns)
    groups = boundary_node_groups(m)
    assert set(groups) == set(range(1, 2 * dim + 1))
    # nodes on group 1 (x=0 side)
    for n in groups[1]:
        assert np.isclose(m.coords[n, 0], 0.0)


@pytest.mark.parametrize("geom,ns", CASES)
def test_dofmap_counts(geom, ns):
    m = unit_box(ns, geom)
    g = GEOMS[geom]
    dm_bq = m.dofmap("biquadratic")
    assert dm_bq.n_dofs == m.n_nodes
    dm_lin = m.dofmap("linear")
    expect_corners = np.prod([n + 1 for n in ns])
    assert dm_lin.n_dofs == expect_corners
    dm0 = m.dofmap("disc_constant")
    assert dm0.n_dofs == m.n_elems
    dm1 = m.dofmap("disc_linear")
    assert dm1.n_dofs == m.n_elems * (1 + m.dim)
    # element conn consistency: dof carrier positions match mesh nodes
    for fam in ("linear", "serendipity", "biquadratic"):
        dm = m.dofmap(fam)
        loc = g.family_nodes[fam]
        assert np.allclose(m.coords[dm.nodes][dm.conn], m.coords[m.conn[:, loc]])


@pytest.mark.parametrize("geom,ns", CASES)
def test_refine(geom, ns):
    m = unit_box(ns, geom)
    f = refine(m)
    g = GEOMS[geom]
    assert f.n_elems == m.n_elems * 2 ** m.dim
    assert np.isclose(mesh_volume(f), 1.0, rtol=1e-12)
    # conforming: each fine node appears with consistent coordinates
    # boundary faces refine 2^(dim-1) per coarse face with same group set
    for fg in m.boundary:
        nc = len(m.boundary[fg].elem)
        nf = len(f.boundary[fg].elem)
        assert nf == nc * 2 ** (m.dim - 1)
        assert set(np.unique(f.boundary[fg].group)) == set(np.unique(m.boundary[fg].group))
    # fine boundary nodes lie on the domain boundary
    gb = boundary_node_groups(f)
    for n in gb.get(1, []):
        assert abs(f.coords[n, 0]) < 1e-12


@pytest.mark.parametrize("geom", ["edge", "quad", "tri", "hex", "tet", "wedge"])
@pytest.mark.parametrize("family", ["linear", "serendipity", "biquadratic",
                                    "disc_constant", "disc_linear"])
def test_local_prolongation_reproduces_polynomials(geom, family):
    """Coarse-element polynomial interpolated to children must be exact for
    polynomials inside the FE space."""
    P = local_prolongation(geom, family)
    g = GEOMS[geom]
    b = get_basis(geom, family)
    rng = np.random.default_rng(0)
    if family in ("disc_constant", "disc_linear"):
        coarse_coeff = rng.normal(size=b.n_basis)
        # evaluate parent poly at a child's interior point both ways
        for k in range(g.children.shape[0]):
            child_coeff = P[k] @ coarse_coeff
            xi_c = g.center                     # point in child frame
            xi_p = get_basis(geom, "linear").eval(xi_c[None])[0] @ g.children[k, :g.n_verts]
            vp = b.eval(xi_p[None])[0] @ coarse_coeff
            vc = b.eval(xi_c[None])[0] @ child_coeff
            assert np.isclose(vp, vc, atol=1e-10), k
    else:
        # linear function captured by all Lagrange families
        a, c0 = rng.normal(size=g.dim), 0.3
        fam_nodes = g.family_nodes[family]
        coarse_vals = g.ref_nodes[fam_nodes] @ a + c0
        for k in range(g.children.shape[0]):
            fine_pos = g.children[k, fam_nodes]
            fine_vals = P[k] @ coarse_vals
            assert np.allclose(fine_vals, fine_pos @ a + c0, atol=1e-10), k


def test_multilevel():
    ml = MultiLevelMesh(unit_box((2, 2), "quad"), n_levels=3)
    assert ml.n_levels == 3
    assert ml.levels[2].n_elems == 4 * 16
    assert ml.levels[1].parent_elem is not None
    ml.erase_coarse_levels(1)
    assert ml.n_levels == 2
    assert ml.levels[0].parent_elem is None
