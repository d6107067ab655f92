"""Conformal minimization (reference applications/Conformal).

Planar case: with Dirichlet boundary data from a holomorphic map
f(z) = z + 0.1 z^2 the conformal energy has the exact zero-energy minimizer
Dx = f(z) - z (Cauchy-Riemann defect V = W = 0), so the solver must
reproduce the analytic map to discretization accuracy.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.assembly.conformal import conformal_minimization, conformal_energy
from femus_tpu.assembly.engine import Assembler, Unknown, ElemOps
from femus_tpu.assembly.bc import generate_bdc, apply_dirichlet_values
from femus_tpu.assembly.norms import error_norms
from femus_tpu.mesh.generation import unit_box


def dx1(x, y):
    return 0.1 * (x * x - y * y)


def dx2(x, y):
    return 0.2 * x * y


def _bc(var, x, grp, t):
    return True, float(dx1(x[0], x[1]) if var == "Dx1" else dx2(x[0], x[1]))


def _solve(n):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    mesh = unit_box((n, n), "quad")
    asm = Assembler(mesh, [Unknown("Dx1", "biquadratic"),
                           Unknown("Dx2", "biquadratic")],
                    quad_order="fifth", dtype=jnp.float64)
    asm.set_volume_form(conformal_minimization(("Dx1", "Dx2")))
    generate_bdc(asm, _bc)
    assemble = asm.make_assemble_fn()
    # conformal energy is nonconvex: start near the holomorphic branch (the
    # reference reparameterizes an already-near-conformal mesh, ex1.cpp:6-7)
    # with a smooth interior perturbation that Newton must pull back.
    xy = mesh.coords[asm.dofmaps["Dx1"].nodes]
    bump = 0.03 * np.sin(np.pi * xy[:, 0]) * np.sin(np.pi * xy[:, 1])
    u = np.zeros(asm.n_dofs)
    nd1 = asm.dofmaps["Dx1"].n_dofs
    u[asm.offsets["Dx1"]:asm.offsets["Dx1"] + nd1] = (
        dx1(xy[:, 0], xy[:, 1]) + bump)
    u[asm.offsets["Dx2"]:asm.offsets["Dx2"] + nd1] = (
        dx2(xy[:, 0], xy[:, 1]) - bump)
    u = apply_dirichlet_values(asm, u)
    w = asm.pattern.width
    rows = np.repeat(np.arange(asm.pattern.n_rows), w)
    cols = np.asarray(asm.pattern.cols).ravel()
    valid = np.asarray(asm.pattern.valid).ravel()
    for it in range(12):
        R, data = assemble(jnp.asarray(u))
        r = np.asarray(R)[:asm.n_dofs]
        if np.linalg.norm(r) < 1e-12:
            break
        J = sp.csr_matrix((np.asarray(data).ravel()[valid],
                           (rows[valid], cols[valid])),
                          shape=(asm.pattern.n_rows,) * 2)[:asm.n_dofs,
                                                           :asm.n_dofs]
        u = u - spla.spsolve(J.tocsc(), r)
    return mesh, asm, u


@pytest.mark.slow
def test_conformal_holomorphic_map():
    errs = []
    for n in (4, 8):
        mesh, asm, u = _solve(n)
        off, nd = asm.offsets["Dx1"], asm.dofmaps["Dx1"].n_dofs
        l2, _ = error_norms(mesh, "biquadratic", jnp.asarray(u[off:off + nd]),
                            lambda x: dx1(x[:, 0], x[:, 1]))
        errs.append(l2)
    # f(z) = z + 0.1 z^2 is quadratic, hence inside the biquadratic FE space:
    # the zero-energy minimizer is reproduced to roundoff on every mesh.
    assert all(e < 1e-12 for e in errs), errs


def test_conformal_energy_zero_at_holomorphic():
    """The conformal energy of the exact holomorphic configuration is ~0
    (V = W = 0 pointwise; ex1.cpp:466 energy definition)."""
    from femus_tpu.fe.tabulate import tabulate
    from femus_tpu.fe.quadrature import gauss
    mesh, asm, u = _solve(4)
    tables = asm.device_tables()
    tabs, qw = tables["tabs"], tables["qweights"]
    off1, nd1 = asm.offsets["Dx1"], asm.dofmaps["Dx1"].n_dofs
    off2 = asm.offsets["Dx2"]
    conn = asm.dofmaps["Dx1"].conn

    def elem_energy(cl, d1, d2):
        ops = ElemOps(tabs, qw, cl, 2)
        return conformal_energy(ops, {"Dx1": d1, "Dx2": d2}, ("Dx1", "Dx2"))

    E = jax.vmap(elem_energy)(tables["coords_e"][:mesh.n_elems],
                              jnp.asarray(u[off1:off1 + nd1])[conn],
                              jnp.asarray(u[off2:off2 + nd1])[conn]).sum()
    # |f'|^2-weighted area is ~2*2*Area for the identity part; the defect
    # energy itself must vanish
    assert float(E) < 1e-10, float(E)
