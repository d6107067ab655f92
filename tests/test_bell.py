"""Blocked-ELL (algebra/bell.py) — the general-unstructured TPU SpMV path."""
import jax.numpy as jnp
import numpy as np
import pytest

from femus_tpu.algebra.bell import build_bell_plan, relayout_ell
from femus_tpu.algebra.sparse import SparseOp


def _random_fem_like_pattern(rng, n_nodes=200, deg=9):
    """Symmetric neighbor pattern resembling a small FEM graph."""
    rows, cols = [np.arange(n_nodes)], [np.arange(n_nodes)]
    for _ in range(deg):
        r = np.arange(n_nodes)
        c = rng.integers(0, n_nodes, n_nodes)
        rows += [r, c]
        cols += [c, r]
    from femus_tpu.algebra.sparse import pattern_from_pairs
    return pattern_from_pairs(np.concatenate(rows), np.concatenate(cols),
                              n_nodes, n_nodes)


def test_bell_matches_ell_random():
    rng = np.random.default_rng(0)
    pat = _random_fem_like_pattern(rng)
    data = rng.standard_normal(pat.cols.shape) * pat.valid
    A = SparseOp(jnp.asarray(data), jnp.asarray(pat.cols), pat.n_cols)
    plan = build_bell_plan(pat)
    B = relayout_ell(plan, jnp.asarray(data))
    x = jnp.asarray(rng.standard_normal(pat.n_rows))
    np.testing.assert_allclose(np.asarray(B @ x), np.asarray(A @ x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(B.diagonal()),
                               np.asarray(A.diagonal()), rtol=1e-12)


@pytest.mark.parametrize("tile", [8, 16])
def test_bell_matches_ell_poisson(tile):
    from femus_tpu.assembly.bc import generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.mesh.generation import unit_box
    import jax

    mesh = unit_box((7, 5), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
    u0 = jnp.zeros(asm.n_dofs_pad)
    _, data = assemble(u0, asm.device_tables())
    A = asm.op_with(data)            # pattern is padded: n_rows == n_dofs_pad
    plan = build_bell_plan(asm.pattern, tile=tile)
    B = relayout_ell(plan, data)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(asm.pattern.n_rows))
    np.testing.assert_allclose(np.asarray(B @ x), np.asarray(A @ x),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(B.diagonal()),
                               np.asarray(A.diagonal()), rtol=1e-12)


def _poisson_system(operator, bell_order="identity", n_levels=3):
    import jax
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.mesh.generation import unit_box
    from femus_tpu.mesh.multilevel import MultiLevelMesh
    from femus_tpu.systems.problem import MultiLevelProblem
    from femus_tpu.systems.solution import MultiLevelSolution
    from femus_tpu.systems.system import LinearImplicitSystem

    exact = lambda x: jnp.sin(jnp.pi * x[:, 0]) * jnp.sin(jnp.pi * x[:, 1])
    ml_mesh = MultiLevelMesh(unit_box((4, 4), "quad"), n_levels)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic")
    ml_sol.initialize("u")
    ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
    ml_sol.generate_bdc("u")
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(LinearImplicitSystem, "Poisson")
    sys.add_unknown("u")
    sys.set_assembly(poisson("u", "biquadratic",
                             rhs=lambda x: 2 * jnp.pi ** 2 * exact(x)))
    sys.config.outer = "cg"
    sys.config.rtol = 1e-10
    sys.config.operator = operator
    sys.config.bell_order = bell_order
    sys.init()
    info = sys.solve()
    return np.asarray(ml_sol.sol[-1]["u"]), info


@pytest.mark.parametrize("bell_order", ["identity", "rcm"])
def test_bell_operator_through_system_mg(bell_order):
    """operator="bell" reproduces the assembled-path MG solve (same V-cycle,
    matvecs on the blocked slab). The 2048-row floor keeps coarse levels on
    ELL; the fine level (~4k dofs) rides BELL."""
    u_ref, info_ref = _poisson_system("assembled")
    u_bell, info = _poisson_system("bell", bell_order)
    assert info["residual"] < 1e-9, info
    np.testing.assert_allclose(u_bell, u_ref, rtol=1e-7, atol=1e-9)


def test_bell_operator_vanka_ns():
    """NS saddle point with Vanka smoothing: block factorizations read the
    ELL side of the wrapped operator while matvecs ride the slab."""
    import jax
    from femus_tpu.assembly.forms import navier_stokes
    from femus_tpu.mesh.generation import unit_box
    from femus_tpu.mesh.multilevel import MultiLevelMesh
    from femus_tpu.systems.problem import MultiLevelProblem
    from femus_tpu.systems.solution import MultiLevelSolution
    from femus_tpu.systems.system import NonLinearImplicitSystem

    def make(operator):
        # 2 levels / few Newton steps: the gate is bell == assembled through
        # the system MG path, which 2 levels already exercise (the 3-level
        # variant added ~6 min of CPU compile+solve for no extra coverage)
        ml_mesh = MultiLevelMesh(unit_box((4, 4), "quad"), 2)
        ml_sol = MultiLevelSolution(ml_mesh)
        ml_sol.add_solution("u", "biquadratic")
        ml_sol.add_solution("v", "biquadratic")
        ml_sol.add_solution("p", "linear")
        for n in ("u", "v", "p"):
            ml_sol.initialize(n)

        def bc(var, x, grp, t):
            if var == "p":
                return (False, 0.0)
            if var == "u" and abs(x[1] - 1.0) < 1e-9:
                return (True, 1.0)
            return (True, 0.0)

        ml_sol.attach_bc(bc)
        for n in ("u", "v", "p"):
            ml_sol.generate_bdc(n)
        ml_sol.fix_solution_at_point("p", 0, 0.0)
        prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
        sys = prob.add_system(NonLinearImplicitSystem, "NS")
        sys.add_unknown("u", "v", "p")
        sys.set_assembly(navier_stokes(("u", "v"), "p", nu=0.1))
        sys.config.smoother = "vanka"
        sys.config.rtol = 1e-9
        sys.config.operator = operator
        sys.config.max_nonlinear = 4
        sys.init()
        info = sys.solve()
        return np.asarray(ml_sol.sol[-1]["u"]), info

    u_ref, _ = make("assembled")
    u_bell, info = make("bell")
    np.testing.assert_allclose(u_bell, u_ref, rtol=1e-6, atol=1e-8)


def test_bell_traffic_ratio_is_small():
    """The whole point: slab bytes stay within ~12x of ideal ELL bytes."""
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.mesh.generation import unit_box

    mesh = unit_box((24, 24), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic"))
    plan = build_bell_plan(asm.pattern)
    assert plan.nnz_bytes_ratio < 12.0
