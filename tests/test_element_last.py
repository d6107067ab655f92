"""element_last assembly layout (the TPU MXU fast path) vs batch_first."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from femus_tpu.assembly.bc import generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import (boussinesq, navier_stokes,
                                      nonlinear_diffusion, poisson)
from femus_tpu.mesh.generation import unit_box


def _check(asm, seed=0):
    gen = jax.jit(asm.make_assemble_fn(pass_tables=True))
    fast = jax.jit(asm.make_assemble_fn(pass_tables=True,
                                        layout="element_last"))
    tables = asm.device_tables()
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(0, 0.2, asm.n_dofs_pad))
    aux_f = {n: jnp.asarray(rng.normal(0, 0.1, asm.dofmaps.get(
        n.replace("_old", ""), asm.dofmaps[asm.unknowns[0].name]).n_dofs))
        for n, _ in asm.aux_field_specs}
    aux_s = {"dt": jnp.asarray(0.1)}
    R1, d1 = gen(u, tables, aux_f, aux_s)
    R2, d2 = fast(u, tables, aux_f, aux_s)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R1),
                               rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("geom", ["quad", "tri", "hex"])
def test_poisson_layouts(geom):
    dim = 2 if geom in ("quad", "tri") else 3
    mesh = unit_box((3,) * dim, geom)
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(nonlinear_diffusion("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    _check(asm)


def test_navier_stokes_layouts():
    mesh = unit_box((3, 3), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic"),
                           Unknown("v", "biquadratic"),
                           Unknown("p", "linear")], quad_order="fifth")
    asm.set_volume_form(navier_stokes(("u", "v"), "p", nu=0.05))
    generate_bdc(asm, lambda var, x, grp, t: ((var != "p"), 0.0))
    _check(asm, 1)


def test_boussinesq_layouts():
    mesh = unit_box((3, 3), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic"),
                           Unknown("v", "biquadratic"),
                           Unknown("p", "linear"),
                           Unknown("T", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(boussinesq(("u", "v"), "p", "T", ra=100.0, pr=0.7))
    generate_bdc(asm, lambda var, x, grp, t: ((var not in ("p",)), 0.0))
    _check(asm, 2)


def test_aux_fields_layouts():
    """Transient form with an old-solution aux field."""
    from femus_tpu.systems.transient import backward_euler
    mesh = unit_box((3, 3), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(backward_euler(poisson("u", "biquadratic"),
                                       {"u": "biquadratic"}))
    asm.add_aux_field("u_old", "biquadratic")
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    gen = jax.jit(asm.make_assemble_fn(pass_tables=True))
    fast = jax.jit(asm.make_assemble_fn(pass_tables=True,
                                        layout="element_last"))
    tables = asm.device_tables()
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(0, 0.2, asm.n_dofs_pad))
    aux_f = {"u_old": jnp.asarray(rng.normal(0, 0.1,
                                             asm.dofmaps["u"].n_dofs))}
    aux_s = {"dt": jnp.asarray(0.05)}
    R1, d1 = gen(u, tables, aux_f, aux_s)
    R2, d2 = fast(u, tables, aux_f, aux_s)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R1),
                               rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-11, atol=1e-12)
