"""Gambit .neu reader tests against the reference's own mesh files
(data only; skipped when the reference tree is not mounted)."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.mesh.gambit import read_neu

REF = "/root/reference/src/06_mesh/00_single_level/01_input/00_mesh_files"
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


def test_quad9_square_with_groups():
    p = (REF + "/01_gambit/2d/square/minus1-plus1_minus1-plus1/"
         "square_2x2_quad_Four_boundary_groups.neu")
    m = read_neu(p)
    assert m.geom == "quad" and m.n_elems == 4 and m.n_nodes == 25
    assert np.isclose(mesh_volume(m), 4.0)
    groups = set()
    for bf in m.boundary.values():
        groups.update(bf.group.tolist())
        # every boundary face's nodes lie on the domain boundary
        for r in range(len(bf.elem)):
            c = m.coords[bf.conn[r]]
            assert np.all(np.max(np.abs(c), axis=1) > 1 - 1e-9)
    assert groups == {1, 2, 3, 4}


def test_tri6_square_completion():
    p = (REF + "/01_gambit/2d/square/minus0p5-plus0p5_minus0p5-plus0p5/"
         "square_2x2_tri_One_boundary_group.neu")
    m = read_neu(p)
    assert m.geom == "tri"
    assert np.isclose(mesh_volume(m), 1.0)
    # completion added one centroid node per tri (25 grid nodes + 1/elem)
    assert m.n_nodes == 25 + m.n_elems
    # centroid of each element equals mean of its corners
    cent = m.coords[m.conn[:, 6]]
    want = m.coords[m.conn[:, :3]].mean(axis=1)
    assert np.allclose(cent, want, atol=1e-9)


def test_3d_meshes():
    import glob
    hexes = glob.glob(REF + "/01_gambit/3d/cube/**/*hex*.neu", recursive=True)
    tets = glob.glob(REF + "/01_gambit/3d/cube/**/*tet*.neu", recursive=True)
    assert hexes and tets
    mh = read_neu(hexes[0])
    assert mh.geom == "hex"
    vh = mesh_volume(mh)
    assert vh > 0 and np.isfinite(vh)
    # hex9-point interior checks: conn center node is element centroid mean
    # of corners for affine cells
    mt = read_neu(tets[0])
    assert mt.geom == "tet"
    assert mesh_volume(mt) > 0
    # quadratic mid nodes lie midway between corners (affine meshes)
    c = mt.coords
    assert np.allclose(c[mt.conn[:, 4]], (c[mt.conn[:, 0]] + c[mt.conn[:, 1]]) / 2,
                       atol=1e-9)


def test_poisson_on_gambit_mesh():
    """Solve Poisson on the reference's 2x2 quad square (shifted domain)."""
    from femus_tpu.assembly.bc import apply_dirichlet_values, generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.assembly.norms import error_norms
    from femus_tpu.algebra.krylov import cg
    from femus_tpu.mesh.multilevel import MultiLevelMesh
    from femus_tpu.mesh.refine import refine

    p = (REF + "/01_gambit/2d/square/minus1-plus1_minus1-plus1/"
         "square_2x2_quad_Four_boundary_groups.neu")
    ml = MultiLevelMesh(read_neu(p), 3)
    mesh = ml.finest()
    k = np.pi / 2

    def exact(x):
        return jnp.cos(k * x[:, 0]) * jnp.cos(k * x[:, 1])

    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic",
                                rhs=lambda x: 2 * k * k * exact(x)))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    u0 = jnp.asarray(apply_dirichlet_values(asm, np.zeros(asm.n_dofs)))
    R, data = jax.jit(asm.make_assemble_fn())(u0)
    A = asm.op_with(data)
    d = A.diagonal()
    x, info = cg(lambda v: A @ v, -R, M=lambda r: r / d, tol=1e-12, maxiter=3000)
    l2, _ = error_norms(mesh, "biquadratic", u0 + x, exact)
    assert l2 < 5e-4, l2
