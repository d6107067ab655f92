"""Mixed element-type meshes (reference per-element types, Elem.hpp:45).

- generated quad+tri hybrid box: Poisson assembly through the per-geometry
  block kernels matches an independent scipy assembly of the union operator,
  manufactured solution converges at the biquadratic order;
- the reference's shipped hybrid SALOME MED mesh (tri + quad in one file)
  reads into blocks with shared nodes, correct groups, and exact total area.
"""
import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from femus_tpu.algebra.krylov import cg
from femus_tpu.assembly.engine import Unknown
from femus_tpu.assembly.mixed import MixedAssembler, generate_bdc_mixed
from femus_tpu.assembly.forms import poisson
from femus_tpu.mesh.mixed import mixed_unit_box

pi = np.pi

# the shipped tri+quad hybrids carry corrupt (4e100) mid-node coordinates in
# the file itself; the two-squares hybrid (QU8 + QU9 blocks) is clean
HYBRID_MED = ("/root/reference/src/06_mesh/00_single_level/01_input/"
              "00_mesh_files/00_salome/2d/zzz_hybrid_meshes/"
              "two_squares_of_different_types/"
              "one_quad8_one_quad9_groups_b_v.med")


def _exact(x):
    return jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1])


def _solve_poisson(ns):
    mm = mixed_unit_box((ns, ns))
    asm = MixedAssembler(mm, [Unknown("u", "biquadratic")],
                         quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic",
                                rhs=lambda x: 2 * pi ** 2 * _exact(x)))
    generate_bdc_mixed(asm, lambda var, x, grp, t: (True, 0.0))
    assemble = asm.make_assemble_fn()
    u0 = jnp.zeros(asm.n_dofs_pad)
    R, data = assemble(u0)
    A = asm.op_with(data)
    d = A.diagonal()
    delta, info = cg(A.matvec, -R, M=lambda r: r / d, tol=1e-12,
                     maxiter=2000)
    return mm, asm, np.asarray(u0 + delta), np.asarray(data)


def _to_csr(pattern, data, n):
    w = pattern.width
    rows = np.repeat(np.arange(pattern.n_rows), w)
    cols = np.asarray(pattern.cols).ravel()
    vals = np.asarray(data).ravel()
    valid = np.asarray(pattern.valid).ravel()
    return sp.csr_matrix((vals[valid], (rows[valid], cols[valid])),
                         shape=(pattern.n_rows, pattern.n_rows))[:n, :n]


def test_mixed_assembly_matches_scipy_union():
    """Union ELL slot-merge equals the scipy sum of per-block operators
    assembled independently (batch_first per-element path)."""
    mm = mixed_unit_box((4, 4))
    asm = MixedAssembler(mm, [Unknown("u", "biquadratic")],
                         quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc_mixed(asm, lambda var, x, grp, t: (True, 0.0))
    assemble = asm.make_assemble_fn()
    u0 = jnp.zeros(asm.n_dofs_pad)
    _, data = assemble(u0)
    A = _to_csr(asm.pattern, data, asm.n_dofs)

    # independent reference: per-block scipy CSR from the batch_first path
    mats = []
    for s in asm.subs:
        fb = s.make_assemble_fn(layout="batch_first")
        _, ds = fb(u0)
        mats.append(_to_csr(s.pattern, ds, s.n_dofs))
    B = (mats[0] + mats[1]).tolil()
    mask = np.asarray(asm.dirichlet_mask)[:asm.n_dofs]
    B[mask, :] = 0.0
    B[:, mask] = 0.0
    for i in np.where(mask)[0]:
        B[i, i] = 1.0
    err = abs(A - B.tocsr()).max()
    assert err < 1e-11, err
    # operator is symmetric (Laplace) and all rows finite
    assert abs(A - A.T).max() < 1e-11


@pytest.mark.slow
def test_mixed_poisson_convergence_order():
    errs = []
    for ns in (4, 8):
        mm, asm, u, _ = _solve_poisson(ns)
        # L2 error via per-block quadrature
        total = 0.0
        for s in asm.subs:
            from femus_tpu.assembly.norms import error_norms
            # block dofmaps carry GLOBAL dof ids, so the global vector
            # restricted to the family's dof count evaluates per block
            l2, _ = error_norms(s.mesh, "biquadratic",
                                jnp.asarray(u[:s.dofmaps["u"].n_dofs]),
                                _exact)
            total += l2 ** 2
        errs.append(np.sqrt(total))
    order = np.log2(errs[0] / errs[1])
    assert order > 2.5, (order, errs)


def test_reference_hybrid_med_reads_mixed():
    from femus_tpu.mesh.med import read_med
    from femus_tpu.mesh.mixed import MixedMesh
    mm = read_med(HYBRID_MED)
    assert isinstance(mm, MixedMesh)
    assert sorted(mm.geoms) == ["quad", "quad"]   # QU8 + QU9 blocks
    assert mm.n_elems == 2
    # exact total area by assembling the constant-1 load over both blocks
    asm = MixedAssembler(mm, [Unknown("u", "biquadratic")],
                         quad_order="fifth")
    asm.set_volume_form(
        lambda ops, u, aux: {"u": -ops.t("biquadratic", 1.0 + 0.0 * ops.value(
            "biquadratic", u["u"]))})
    assemble = asm.make_assemble_fn(with_jacobian=False)
    R, _ = assemble(jnp.zeros(asm.n_dofs_pad))
    area = -float(np.sum(np.asarray(R)[:asm.n_dofs]))
    # independent geometric truth: shoelace area of each block's corner
    # polygon (the file is a 2x1 quad + a unit right triangle = 2.5)
    from femus_tpu.fe.geom import GEOMS

    def shoelace(p):
        x, y = p[:, 0], p[:, 1]
        return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

    exact = sum(shoelace(b.coords[b.conn[e, :GEOMS[b.geom].n_verts]])
                for b in mm.blocks for e in range(b.n_elems))
    assert area == pytest.approx(exact, rel=1e-10)
    # both blocks carry boundary groups from the file (b_v groups 1/2)
    assert all(b.boundary for b in mm.blocks)
    # boundary groups survived with global node ids in range
    for b in mm.blocks:
        for bf in b.boundary.values():
            assert bf.conn.max() < mm.n_nodes
