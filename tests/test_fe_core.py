"""FE core tests: bases (nodal property, partition of unity, polynomial
reproduction) and quadrature exactness — the foundation layer the reference
validates implicitly through its golden-value runs (SURVEY.md §4)."""
import itertools

import numpy as np
import pytest

from femus_tpu.fe.basis import get_basis
from femus_tpu.fe.geom import GEOMS, LAGRANGE_FAMILIES
from femus_tpu.fe.quadrature import gauss
from femus_tpu.fe.tabulate import face_trace_nodes, inverse_map_newton, tabulate

VOL_GEOMS = ["edge", "quad", "tri", "hex", "tet", "wedge"]

REF_VOLUME = {"edge": 2.0, "quad": 4.0, "tri": 0.5, "hex": 8.0, "tet": 1.0 / 6.0,
              "wedge": 1.0}

FAMILY_DEG = {"linear": 1, "serendipity": 2, "biquadratic": 2}


@pytest.mark.parametrize("geom", VOL_GEOMS)
@pytest.mark.parametrize("family", LAGRANGE_FAMILIES)
def test_nodal_basis(geom, family):
    b = get_basis(geom, family)
    vals = b.eval(b.nodes)
    assert np.allclose(vals, np.eye(b.n_basis), atol=1e-10)


@pytest.mark.parametrize("geom", VOL_GEOMS)
@pytest.mark.parametrize("family", LAGRANGE_FAMILIES)
def test_partition_of_unity(geom, family):
    b = get_basis(geom, family)
    pts, _ = gauss(geom, 5)
    assert np.allclose(b.eval(pts).sum(axis=-1), 1.0, atol=1e-10)
    # gradients sum to zero
    assert np.allclose(b.eval_grad(pts).sum(axis=-2), 0.0, atol=1e-10)


@pytest.mark.parametrize("geom", VOL_GEOMS)
@pytest.mark.parametrize("family", LAGRANGE_FAMILIES)
def test_linear_reproduction(geom, family):
    """Interpolating an affine function is exact for every Lagrange family."""
    b = get_basis(geom, family)
    dim = GEOMS[geom].dim
    rng = np.random.default_rng(0)
    a, c = rng.normal(size=dim), 0.7
    f = lambda x: x @ a + c
    dofs = f(b.nodes)
    pts, _ = gauss(geom, 4)
    assert np.allclose(b.eval(pts) @ dofs, f(pts), atol=1e-9)


@pytest.mark.parametrize("geom", ["quad", "tri", "hex", "tet", "wedge"])
def test_quadratic_reproduction(geom):
    """Serendipity/biquadratic reproduce all quadratics (and grads match)."""
    rng = np.random.default_rng(1)
    dim = GEOMS[geom].dim
    A = rng.normal(size=(dim, dim))
    A = A + A.T
    bvec, c = rng.normal(size=dim), -0.3
    f = lambda x: np.einsum("pi,ij,pj->p", x, A, x) + x @ bvec + c
    gradf = lambda x: 2 * x @ A + bvec
    for family in ("serendipity", "biquadratic"):
        b = get_basis(geom, family)
        dofs = f(b.nodes)
        pts, _ = gauss(geom, 5)
        assert np.allclose(b.eval(pts) @ dofs, f(pts), atol=1e-9), family
        got = np.einsum("pnd,n->pd", b.eval_grad(pts), dofs)
        assert np.allclose(got, gradf(pts), atol=1e-8), family


@pytest.mark.parametrize("geom", VOL_GEOMS)
@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4, 5, 7])
def test_quadrature_exactness(geom, deg):
    pts, w = gauss(geom, deg)
    dim = GEOMS[geom].dim
    assert np.isclose(w.sum(), REF_VOLUME[geom], rtol=1e-12)
    # integrate random polynomial of total degree <= deg exactly: compare
    # against a much higher-order rule
    rng = np.random.default_rng(deg)
    exps = [e for e in itertools.product(range(deg + 1), repeat=dim) if sum(e) <= deg]
    coef = rng.normal(size=len(exps))
    def poly(x):
        return sum(c * np.prod(x ** np.array(e), axis=-1) for c, e in zip(coef, exps))
    hi_pts, hi_w = gauss(geom, 12)
    assert np.isclose(w @ poly(pts), hi_w @ poly(hi_pts), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("geom", VOL_GEOMS)
def test_disc_families(geom):
    b0 = get_basis(geom, "disc_constant")
    assert np.allclose(b0.eval(GEOMS[geom].center[None]), 1.0)
    b1 = get_basis(geom, "disc_linear")
    pts, _ = gauss(geom, 2)
    vals = b1.eval(pts)         # (nq, 1+dim): [1, xi, eta, (zeta)]
    assert np.allclose(vals[:, 0], 1.0)
    assert np.allclose(vals[:, 1:], pts)


@pytest.mark.parametrize("geom", ["quad", "tri", "hex", "tet", "wedge"])
@pytest.mark.parametrize("family", LAGRANGE_FAMILIES)
def test_face_trace(geom, family):
    """Volume basis restricted to a face equals the face-geom basis at the
    face's own nodes (needed for Neumann surface integrals)."""
    g = GEOMS[geom]
    for iface, (fgeom, f_bq) in enumerate(g.faces):
        face_family, loc = face_trace_nodes(geom, family, iface)
        vb = get_basis(geom, family)
        # face node ref coords (in volume frame)
        f_bq_arr = np.asarray(f_bq)
        face_nodes_vol = g.ref_nodes[f_bq_arr[GEOMS[fgeom].family_nodes[face_family]]]
        vals = vb.eval(face_nodes_vol)           # (n_face_nodes, n_vol_basis)
        expect = np.zeros_like(vals)
        for i, l in enumerate(loc):
            expect[i, l] = 1.0
        assert np.allclose(vals, expect, atol=1e-10), (geom, family, iface)


@pytest.mark.parametrize("geom", VOL_GEOMS)
def test_children_cover_parent(geom):
    """Midpoint-refinement children: corners live inside parent, child volumes
    sum to parent volume (affine children)."""
    g = GEOMS[geom]
    kids = g.children
    assert kids.shape[0] == 2 ** g.dim
    total = 0.0
    for k in range(kids.shape[0]):
        corners = kids[k, :g.n_verts]
        b = get_basis(geom, "linear")
        pts, w = gauss(geom, 3)
        dphi = b.eval_grad(pts)                  # (nq, nverts... ) linear family
        J = np.einsum("qnd,ne->qde", dphi, corners)
        detJ = np.abs(np.linalg.det(J))
        total += (w * detJ).sum()
    assert np.isclose(total, REF_VOLUME[geom], rtol=1e-10)


def test_inverse_map_numpy_and_jit():
    import jax
    import jax.numpy as jnp
    g = GEOMS["quad"]
    rng = np.random.default_rng(3)
    # a mildly distorted quad
    corners = np.array([[0, 0], [2, 0.1], [2.2, 1.9], [-0.1, 2.0]])
    coords = np.asarray(
        __import__("femus_tpu.fe.geom", fromlist=["nodes_from_corners"]).nodes_from_corners("quad", corners))
    xi_true = np.array([0.3, -0.4])
    b = get_basis("quad", "biquadratic")
    x_phys = b.eval(xi_true[None])[0] @ coords
    xi_np = inverse_map_newton("quad", coords, x_phys, np)
    assert np.allclose(xi_np, xi_true, atol=1e-10)
    xi_j = jax.jit(lambda c, x: inverse_map_newton("quad", c, x, jnp))(
        jnp.asarray(coords), jnp.asarray(x_phys))
    assert np.allclose(np.asarray(xi_j), xi_true, atol=1e-8)
