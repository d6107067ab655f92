"""Lattice stencil SpMV: decomposition of DIA offsets to (di, dj) and the
Pallas row-tiled kernel (interpret mode) against the ELL reference."""
import unittest.mock

import numpy as np
import jax.numpy as jnp

from femus_tpu.algebra import dia as dia_mod
from femus_tpu.algebra.stencil import build_stencil, spmv_stencil_pallas


def _q2_op(n):
    from femus_tpu.assembly.bc import generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.mesh.generation import unit_box

    mesh = unit_box((n, n), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    assemble = asm.make_assemble_fn()
    u0 = jnp.zeros(asm.n_dofs_pad)
    _, data = assemble(u0)
    return asm.op_with(data), asm.pattern, 2 * n + 1


def test_stencil_matches_ell():
    A, pattern, width = _q2_op(6)
    plan = dia_mod.build_dia_plan(pattern, max_diags=64)
    assert plan is not None
    D = plan.apply(A.data, pattern.n_rows)
    S = build_stencil(D, width)
    assert S is not None
    assert all(abs(di) <= 2 and abs(dj) <= 2 for di, dj in S.offsets)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=pattern.n_rows))
    np.testing.assert_allclose(np.asarray(S @ x), np.asarray(A @ x),
                               rtol=1e-12, atol=1e-12)


def test_stencil_pallas_interpret():
    from jax.experimental import pallas as pl
    A, pattern, width = _q2_op(4)
    plan = dia_mod.build_dia_plan(pattern, max_diags=64)
    D = plan.apply(A.data, pattern.n_rows)
    S = build_stencil(D, width, rows_per_tile=8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=pattern.n_rows))
    orig = pl.pallas_call
    with unittest.mock.patch.object(
            pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k)):
        got = np.asarray(spmv_stencil_pallas(S, x, rows_per_tile=8))
    np.testing.assert_allclose(got, np.asarray(A @ x), rtol=1e-12, atol=1e-12)


def test_stencil_rejects_unstructured():
    # a dof numbering that is not a lattice: wrong row width
    A, pattern, width = _q2_op(4)
    plan = dia_mod.build_dia_plan(pattern, max_diags=64)
    D = plan.apply(A.data, pattern.n_rows)
    assert build_stencil(D, width + 1) is None     # indivisible
    assert build_stencil(D, 3, max_halo=2) is None  # offsets don't decompose
