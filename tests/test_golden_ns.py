"""Golden-value regression vs the reference's testNSSteadyDD.

Reproduces the stored L2 norms of unittests/testNSSteadyDD/main.cpp:204-237
(the reference's hard-coded regression anchors, rtol 1e-6) with this
framework's mesh reader, refinement, dofmaps, and batched-jacfwd assembly.
The linear solves use a direct sparse LU: the golden U/V/P values are the
converged discrete solution at level 3, so any sufficiently tight solver
reproduces them — this test pins the *discretization* (mesh geometry,
Q2/P1dc spaces, quadrature, weak form, BC insertion) to the reference.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from femus_tpu.apps import ns_bench


def _to_csr(pattern, data, n):
    w = pattern.width
    rows = np.repeat(np.arange(pattern.n_rows), w)
    cols = np.asarray(pattern.cols).ravel()
    vals = np.asarray(data).ravel()
    valid = np.asarray(pattern.valid).ravel()
    return sp.csr_matrix((vals[valid], (rows[valid], cols[valid])),
                         shape=(pattern.n_rows, pattern.n_rows))[:n, :n]


@pytest.fixture(scope="module")
def level3():
    return ns_bench.load_mesh(3)


def test_golden_ns_norms(level3):
    mesh = level3
    asm = ns_bench.make_ns_assembler(mesh)
    assemble = asm.make_assemble_fn()
    u = ns_bench.initial_guess(asm, mesh)
    for _ in range(10):
        R, data = assemble(jnp.asarray(u))
        r = np.asarray(R)[:asm.n_dofs]
        if np.linalg.norm(r) < 1e-12:
            break
        J = _to_csr(asm.pattern, data, asm.n_dofs)
        u = u - spla.spsolve(J.tocsc(), r)
    else:
        pytest.fail("Newton did not converge")

    for k in ("U", "V", "P"):
        assert ns_bench.var_norm(asm, u, k) == pytest.approx(
            ns_bench.GOLD[k], rel=1e-6), k


def test_golden_T_initialization(level3):
    """Reference level-3 T is the GenerateBdc-initialized field (V_CYCLE
    solves only the finest level; see apps/ns_bench.py docstring)."""
    asmT = ns_bench.make_temperature_assembler(level3)
    t = ns_bench.bdc_initialized_T(asmT, level3)
    assert ns_bench.var_norm(asmT, t, "T") == pytest.approx(
        ns_bench.GOLD["T"], rel=1e-9)


def test_temperature_solve_regular(level3):
    """The converged discrete temperature (advection-diffusion in the solved
    velocity field) stays within the Dirichlet bounds away from the
    oscillatory wake — a physical sanity check on the coupled solve."""
    mesh = level3
    asm = ns_bench.make_ns_assembler(mesh)
    assemble = asm.make_assemble_fn()
    u = ns_bench.initial_guess(asm, mesh)
    for _ in range(10):
        R, data = assemble(jnp.asarray(u))
        r = np.asarray(R)[:asm.n_dofs]
        if np.linalg.norm(r) < 1e-10:
            break
        J = _to_csr(asm.pattern, data, asm.n_dofs)
        u = u - spla.spsolve(J.tocsc(), r)

    asmT = ns_bench.make_temperature_assembler(mesh)
    assembleT = asmT.make_assemble_fn()
    oU, nU = asm.offsets["U"], asm.dofmaps["U"].n_dofs
    oV, nV = asm.offsets["V"], asm.dofmaps["V"].n_dofs
    aux = {"U": jnp.asarray(u[oU:oU + nU]), "V": jnp.asarray(u[oV:oV + nV])}
    t = ns_bench.bdc_initialized_T(asmT, mesh)
    R, data = assembleT(jnp.asarray(t), aux_fields=aux)
    J = _to_csr(asmT.pattern, data, asmT.n_dofs)
    t = t - spla.spsolve(J.tocsc(), np.asarray(R)[:asmT.n_dofs])
    # inflow value 1 and cylinder value 5 bound the temperature up to mild
    # discrete over/undershoot at Pe_h ~ O(1)
    assert t.min() > -1.0 and t.max() < 7.0
