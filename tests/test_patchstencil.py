"""Patch-lattice stencil operator (mesh/patches.py + algebra/patchstencil.py).

The TPU-native SpMV path for refined meshes: verify the patch-coherent
renumbering, the direct patch-layout assembly, and the stencil matvec against
the general ELL operator on (a) a generated box and (b) the reference's
unstructured nsbenc coarse mesh (unittests/testNSSteadyDD/input/nsbenc.neu).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.assembly.bc import generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import poisson
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.gambit import read_neu
from femus_tpu.mesh.patches import refine_patched

NSBENC = "/root/reference/unittests/testNSSteadyDD/input/nsbenc.neu"
pi = np.pi


def rhs(x):
    return 2 * pi ** 2 * jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1])


def _assemblers(coarse, levels, bc=True):
    fine, plan = refine_patched(coarse, levels)
    a_ell = Assembler(fine, [Unknown("u", "biquadratic")], quad_order="fifth")
    a_pat = Assembler(fine, [Unknown("u", "biquadratic")], quad_order="fifth")
    for a in (a_ell, a_pat):
        a.set_volume_form(poisson("u", "biquadratic", rhs=rhs))
        if bc:
            generate_bdc(a, lambda var, x, grp, t: (True, 0.0))
    a_pat.set_patch_layout(plan)
    return fine, plan, a_ell, a_pat


@pytest.mark.parametrize("levels", [1, 2])
@pytest.mark.parametrize("mesh_name", ["box", "nsbenc"])
def test_patch_matvec_matches_ell(mesh_name, levels):
    coarse = (unit_box((3, 2), "quad") if mesh_name == "box"
              else read_neu(NSBENC))
    fine, plan, a_ell, a_pat = _assemblers(coarse, levels)

    u0 = jnp.zeros(a_ell.n_dofs_pad)
    R_e, d_e = a_ell.make_assemble_fn()(u0)
    R_p, d_p = a_pat.make_assemble_fn()(u0)
    A_e = a_ell.op_with(d_e)
    A_p = a_pat.op_with(d_p)

    assert np.allclose(np.asarray(R_e), np.asarray(R_p), atol=1e-12)
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal(a_ell.n_dofs_pad))
        ye = np.asarray(A_e @ x)
        yp = np.asarray(A_p @ x)
        assert np.allclose(ye, yp, atol=1e-10), np.abs(ye - yp).max()
    # diagonal agrees too (smoother scaling)
    assert np.allclose(np.asarray(A_e.diagonal()),
                       np.asarray(A_p.diagonal()), atol=1e-10)


def test_block_patch_matvec_matches_ell():
    """Multi-variable (vector) biquadratic block system: plane-strain linear
    elasticity (DX, DY) through the block patch stencil vs ELL."""
    from femus_tpu.assembly.forms import elasticity

    coarse = read_neu(NSBENC)
    fine, plan = refine_patched(coarse, 1)
    unks = [Unknown("DX", "biquadratic"), Unknown("DY", "biquadratic")]
    form = elasticity(("DX", "DY"), model="linear", lam=1.2, mu=0.8)
    a_ell = Assembler(fine, unks, quad_order="fifth")
    a_pat = Assembler(fine, unks, quad_order="fifth")
    for a in (a_ell, a_pat):
        a.set_volume_form(form)
        generate_bdc(a, lambda var, x, grp, t: (grp == 1, 0.0))
    a_pat.set_patch_layout(plan)

    u0 = jnp.zeros(a_ell.n_dofs_pad)
    R_e, d_e = a_ell.make_assemble_fn()(u0)
    R_p, d_p = a_pat.make_assemble_fn()(u0)
    A_e = a_ell.op_with(d_e)
    A_p = a_pat.op_with(d_p)
    assert np.allclose(np.asarray(R_e), np.asarray(R_p), atol=1e-12)
    rng = np.random.default_rng(7)
    for _ in range(2):
        x = jnp.asarray(rng.standard_normal(a_ell.n_dofs_pad))
        ye = np.asarray(A_e @ x)
        yp = np.asarray(A_p @ x)
        assert np.allclose(ye, yp, atol=1e-10), np.abs(ye - yp).max()
    assert np.allclose(np.asarray(A_e.diagonal()),
                       np.asarray(A_p.diagonal()), atol=1e-10)


def test_patch_gather_plan_assembly_matches_scatter():
    """The scatter-free gather-plan form of patch assembly (slot-sources
    sum) produces identical stencil data."""
    coarse = unit_box((3, 2), "quad")
    fine, plan, a_ell, a_pat = _assemblers(coarse, 2)
    fn = a_pat.make_assemble_fn(pass_tables=True)
    u0 = jnp.zeros(a_pat.n_dofs_pad)
    t_sc = a_pat.device_tables()
    R1, d1 = fn(u0, t_sc)
    t_ga = a_pat.device_tables()
    t_ga["gather"] = a_pat.gather_plan()
    R2, d2 = fn(u0, t_ga)
    assert np.allclose(np.asarray(R1), np.asarray(R2), atol=1e-12)
    assert np.allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)


def test_patch_cg_solves_poisson():
    """End-to-end: CG with Jacobi on the patch operator reproduces the
    manufactured Poisson solution on the refined nsbenc-style box."""
    from femus_tpu.algebra.krylov import cg
    from femus_tpu.assembly.norms import error_norms

    coarse = unit_box((4, 3), "quad")
    fine, plan, a_ell, a_pat = _assemblers(coarse, 2)
    asm = a_pat
    assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
    u0 = jnp.zeros(asm.n_dofs_pad)
    R, data = assemble(u0, asm.device_tables())
    A = asm.op_with(data)
    d = A.diagonal()
    dsafe = jnp.where(jnp.abs(d) < 1e-30, 1.0, d)
    x, info = cg(A.matvec, -R, M=lambda r: r / dsafe, tol=1e-12, maxiter=400)
    err, _ = error_norms(fine, "biquadratic", jnp.asarray(x),
                         lambda c: jnp.sin(pi * c[:, 0]) * jnp.sin(pi * c[:, 1]))
    assert err < 1.2e-4   # Q2 discretization error on the 16x12 mesh
