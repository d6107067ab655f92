"""Scatter-free lattice stencil assembly vs the generic ELL path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from femus_tpu.assembly.bc import generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import nonlinear_diffusion, poisson
from femus_tpu.assembly.lattice import build_lattice_plan, make_lattice_assemble_fn
from femus_tpu.mesh.generation import unit_box


def _setup(n, family, form):
    mesh = unit_box((n, n), "quad")
    asm = Assembler(mesh, [Unknown("u", family)], quad_order="fifth")
    asm.set_volume_form(form)
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    return asm


@pytest.mark.parametrize("family", ["linear", "biquadratic"])
def test_matches_ell_path(family):
    rhs = lambda x: jnp.sin(3 * x[:, 0]) + x[:, 1]
    asm = _setup(5, family, poisson("u", family, rhs=rhs))
    plan = build_lattice_plan(asm)
    assert plan is not None
    lat = jax.jit(make_lattice_assemble_fn(asm, plan),
                  static_argnames=())
    gen = jax.jit(asm.make_assemble_fn(pass_tables=True))
    tables = asm.device_tables()
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(0, 0.3, asm.n_dofs_pad))
    R1, d1 = gen(u, tables)
    R2, S = lat(u, tables)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R1),
                               rtol=1e-12, atol=1e-13)
    # operator equality through matvecs (formats differ)
    A = asm.op_with(d1)
    for seed in (1, 2):
        x = jnp.asarray(np.random.default_rng(seed).normal(
            size=asm.n_dofs_pad))
        y1 = np.asarray(A @ x)[:S.n_rows]
        y2 = np.asarray(S @ x[:S.n_rows])
        np.testing.assert_allclose(y2, y1, rtol=1e-12, atol=1e-12)


def test_nonlinear_form_jacobian():
    """State-dependent Jacobian (nonlinear diffusion) goes through the same
    jacfwd; the stencil operator matches the ELL one at a nonzero state."""
    asm = _setup(4, "biquadratic", nonlinear_diffusion("u", "biquadratic"))
    plan = build_lattice_plan(asm)
    lat = jax.jit(make_lattice_assemble_fn(asm, plan))
    gen = jax.jit(asm.make_assemble_fn(pass_tables=True))
    tables = asm.device_tables()
    u = jnp.asarray(np.random.default_rng(3).normal(0, 0.2, asm.n_dofs_pad))
    R1, d1 = gen(u, tables)
    R2, S = lat(u, tables)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R1),
                               rtol=1e-11, atol=1e-12)
    A = asm.op_with(d1)
    x = jnp.asarray(np.random.default_rng(4).normal(size=asm.n_dofs_pad))
    np.testing.assert_allclose(np.asarray(S @ x[:S.n_rows]),
                               np.asarray(A @ x)[:S.n_rows],
                               rtol=1e-11, atol=1e-12)


def test_rejects_non_lattice():
    mesh = unit_box((3, 3), "tri")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic"))
    assert build_lattice_plan(asm) is None
