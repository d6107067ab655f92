"""Surface (manifold) finite elements: Laplace-Beltrami on an embedded
cylinder patch.

The reference's Willmore-surface and Conformal apps solve geometric PDEs on
2-D meshes embedded in 3-D (applications/Conformal/input/*3D.neu).  Here the
engine's rectangular-Jacobian path (first fundamental form) is verified
against the exact Laplace-Beltrami eigenfunction on a half-cylinder of
radius 1:  u = sin(phi) sin(pi z),  -Lap_Gamma u = (1 + pi^2) u.
"""
import numpy as np
import jax.numpy as jnp

from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import poisson
from femus_tpu.assembly.bc import generate_bdc, apply_dirichlet_values
from femus_tpu.assembly.norms import error_norms, integrate_field
from femus_tpu.mesh.generation import unit_box, map_to_surface


def cyl(p):
    phi = np.pi * p[:, 0]
    return np.stack([np.cos(phi), np.sin(phi), p[:, 1]], axis=-1)


def exact(x):          # ambient coords: sin(phi) = y on the unit cylinder
    return x[:, 1] * jnp.sin(np.pi * x[:, 2])


def _solve(n):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    mesh = map_to_surface(unit_box((n, n), "quad"), cyl)
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="seventh",
                    dtype=jnp.float64)
    asm.set_volume_form(poisson("u", rhs=lambda x: (1 + np.pi ** 2) * exact(x)))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    assemble = asm.make_assemble_fn()
    u = apply_dirichlet_values(asm, np.zeros(asm.n_dofs))
    R, data = assemble(jnp.asarray(u))
    w = asm.pattern.width
    rows = np.repeat(np.arange(asm.pattern.n_rows), w)
    cols = np.asarray(asm.pattern.cols).ravel()
    valid = np.asarray(asm.pattern.valid).ravel()
    J = sp.csr_matrix((np.asarray(data).ravel()[valid],
                       (rows[valid], cols[valid])),
                      shape=(asm.pattern.n_rows,) * 2)[:asm.n_dofs, :asm.n_dofs]
    u = u - spla.spsolve(J.tocsc(), np.asarray(R)[:asm.n_dofs])
    return mesh, asm, u


def test_laplace_beltrami_cylinder_convergence():
    errs = []
    for n in (4, 8):
        mesh, asm, u = _solve(n)
        l2, _ = error_norms(mesh, "biquadratic", jnp.asarray(u), exact)
        errs.append(l2)
    # biquadratic: order 3 in L2 (geometric consistency: isoparametric Q2
    # surface approximates the cylinder to the same order)
    assert np.log2(errs[0] / errs[1]) > 2.5, errs
    assert errs[-1] < 5e-4, errs


def test_surface_area_element():
    """Area of the half-cylinder patch (radius 1, height 1) = pi."""
    mesh = map_to_surface(unit_box((8, 8), "quad"), cyl)
    one = np.ones(mesh.dofmap("biquadratic").n_dofs)
    area = integrate_field(mesh, "biquadratic", jnp.asarray(one))
    # isoparametric Q2 geometry: area error O(h^4)
    assert abs(area - np.pi) < 1e-4, area
