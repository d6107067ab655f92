"""End-to-end Poisson solves: the first correctness gate (SURVEY.md §7
Phase 1, mirroring reference tutorial ex02_poisson_* manufactured-solution
convergence runs)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.assembly.bc import apply_dirichlet_values, generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import neumann_faces, poisson
from femus_tpu.assembly.norms import error_norms
from femus_tpu.algebra.krylov import cg, gmres
from femus_tpu.mesh.generation import unit_box


def exact2(x):
    return jnp.sin(jnp.pi * x[:, 0]) * jnp.sin(jnp.pi * x[:, 1])


def exact2_grad(x):
    pi = jnp.pi
    return jnp.stack([pi * jnp.cos(pi * x[:, 0]) * jnp.sin(pi * x[:, 1]),
                      pi * jnp.sin(pi * x[:, 0]) * jnp.cos(pi * x[:, 1])], axis=-1)


def rhs2(x):
    return 2 * jnp.pi ** 2 * exact2(x)


def solve_poisson(mesh, family, quad="fifth"):
    asm = Assembler(mesh, [Unknown("u", family)], quad_order=quad)
    asm.set_volume_form(poisson("u", family, rhs=rhs2))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    u0 = jnp.asarray(apply_dirichlet_values(asm, np.zeros(asm.n_dofs)))
    assemble = jax.jit(asm.make_assemble_fn())
    R, data = assemble(u0)
    A = asm.op_with(data)
    d = A.diagonal()
    M = lambda r: r / d
    delta, info = cg(lambda x: A @ x, -R, M=M, tol=1e-12, maxiter=2000)
    return asm, u0 + delta, info


@pytest.mark.parametrize("geom", ["quad", "tri"])
@pytest.mark.parametrize("family", ["linear", "serendipity", "biquadratic"])
def test_poisson_2d_convergence(geom, family):
    errs = []
    for n in (4, 8):
        mesh = unit_box((n, n), geom)
        asm, u, info = solve_poisson(mesh, family)
        l2, h1 = error_norms(mesh, family, u, exact2, exact2_grad)
        errs.append((l2, h1))
    p = 1 if family == "linear" else 2
    order_l2 = np.log2(errs[0][0] / errs[1][0])
    order_h1 = np.log2(errs[0][1] / errs[1][1])
    assert order_l2 > p + 0.7, (order_l2, errs)
    assert order_h1 > p - 0.3, (order_h1, errs)


@pytest.mark.parametrize("geom", ["hex", "tet", "wedge"])
def test_poisson_3d(geom):
    def exact3(x):
        return jnp.sin(jnp.pi * x[:, 0]) * jnp.sin(jnp.pi * x[:, 1]) * jnp.sin(jnp.pi * x[:, 2])

    def rhs3(x):
        return 3 * jnp.pi ** 2 * exact3(x)

    errs = []
    for n in (2, 4):
        mesh = unit_box((n, n, n), geom)
        asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
        asm.set_volume_form(poisson("u", "biquadratic", rhs=rhs3))
        generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
        u0 = jnp.asarray(apply_dirichlet_values(asm, np.zeros(asm.n_dofs)))
        R, data = jax.jit(asm.make_assemble_fn())(u0)
        A = asm.op_with(data)
        d = A.diagonal()
        x, info = cg(lambda v: A @ v, -R, M=lambda r: r / d, tol=1e-11, maxiter=3000)
        l2, _ = error_norms(mesh, "biquadratic", u0 + x, exact3)
        errs.append(l2)
    order = np.log2(errs[0] / errs[1])
    assert order > 2.5, (order, errs)


def test_poisson_neumann():
    """-u'' = f with u = cos(pi x) cos(pi y): pure-Neumann on x-sides via
    du/dn = 0 there (homogeneous natural BC), Dirichlet on y-sides."""
    def exact(x):
        return jnp.cos(jnp.pi * x[:, 0]) * jnp.cos(jnp.pi * x[:, 1])

    def rhs(x):
        return 2 * jnp.pi ** 2 * exact(x)

    errs = []
    for n in (4, 8):
        mesh = unit_box((n, n), "quad")
        asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
        asm.set_volume_form(poisson("u", "biquadratic", rhs=rhs))

        def bc(var, x, grp, t):
            if grp in (3, 4):     # y sides: Dirichlet
                return True, float(np.cos(np.pi * x[0]) * np.cos(np.pi * x[1]))
            return False, 0.0     # x sides: homogeneous Neumann (natural)

        generate_bdc(asm, bc)
        u0 = jnp.asarray(apply_dirichlet_values(asm, np.zeros(asm.n_dofs)))
        R, data = jax.jit(asm.make_assemble_fn())(u0)
        A = asm.op_with(data)
        d = A.diagonal()
        x, info = cg(lambda v: A @ v, -R, M=lambda r: r / d, tol=1e-12, maxiter=3000)
        l2, _ = error_norms(mesh, "biquadratic", u0 + x, exact)
        errs.append(l2)
    assert np.log2(errs[0] / errs[1]) > 2.5, errs


def test_poisson_inhomogeneous_neumann_flux_form():
    """u = x^2 + y^2: Dirichlet on 3 sides, inhomogeneous Neumann du/dn = 2
    on x=1 via a face form; quadratic space reproduces exactly."""
    mesh = unit_box((3, 3), "quad")
    fam = "biquadratic"
    asm = Assembler(mesh, [Unknown("u", fam)], quad_order="fifth")
    asm.set_volume_form(poisson("u", fam, rhs=lambda x: -4.0 * jnp.ones(x.shape[0])))
    asm.set_face_form(neumann_faces({2: lambda x, n: 2.0 * jnp.ones(x.shape[0])}, "u"))

    def bc(var, x, grp, t):
        if grp == 2:
            return False, 0.0
        return True, float(x[0] ** 2 + x[1] ** 2)

    generate_bdc(asm, bc)
    u0 = jnp.asarray(apply_dirichlet_values(asm, np.zeros(asm.n_dofs)))
    R, data = jax.jit(asm.make_assemble_fn())(u0)
    A = asm.op_with(data)
    d = A.diagonal()
    x, info = cg(lambda v: A @ v, -R, M=lambda r: r / d, tol=1e-13, maxiter=2000)
    u = u0 + x
    l2, _ = error_norms(mesh, fam, u, lambda p: p[:, 0] ** 2 + p[:, 1] ** 2)
    assert l2 < 1e-9, l2


def test_gmres_matches_cg():
    mesh = unit_box((6, 6), "quad")
    asm, u, info = solve_poisson(mesh, "biquadratic")
    asm2 = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm2.set_volume_form(poisson("u", "biquadratic", rhs=rhs2))
    generate_bdc(asm2, lambda var, x, grp, t: (True, 0.0))
    u0 = jnp.asarray(apply_dirichlet_values(asm2, np.zeros(asm2.n_dofs)))
    R, data = jax.jit(asm2.make_assemble_fn())(u0)
    A = asm2.op_with(data)
    d = A.diagonal()
    xg, infog = gmres(lambda v: A @ v, -R, M=lambda r: r / d, tol=1e-12,
                      restart=40, max_restarts=20)
    assert np.allclose(np.asarray(u0 + xg), np.asarray(u), atol=1e-8)


def test_gather_assembly_matches_scatter():
    """The gather-transposed assembly (TPU hot path) is bitwise-comparable
    to the scatter path up to summation order."""
    import jax
    import jax.numpy as jnp
    from femus_tpu.assembly.bc import generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import navier_stokes
    from femus_tpu.mesh.generation import unit_box

    mesh = unit_box((4, 4), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic"),
                           Unknown("v", "biquadratic"),
                           Unknown("p", "linear")], quad_order="fifth",
                    pad_dofs_to=4, pad_elems_to=4)
    asm.set_volume_form(navier_stokes(("u", "v"), "p", nu=0.1))
    generate_bdc(asm, lambda var, x, grp, t: ((var != "p"), 0.0))
    assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
    t_scatter = asm.device_tables()
    t_gather = dict(t_scatter)
    t_gather["gather"] = asm.gather_plan()
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.normal(0, 0.2, asm.n_dofs_pad))
    R1, d1 = assemble(u0, t_scatter)
    R2, d2 = assemble(u0, t_gather)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-13, atol=1e-13)
