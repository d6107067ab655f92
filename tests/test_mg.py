"""Multigrid tests: PtAP schedule vs scipy triple product; MG-preconditioned
CG on Poisson over a level hierarchy (reference Vcycle/MGSolve semantics,
LinearImplicitSystem.cpp:468-497)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from femus_tpu.assembly.bc import apply_dirichlet_values, generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import poisson
from femus_tpu.assembly.norms import error_norms
from femus_tpu.algebra.krylov import cg
from femus_tpu.algebra.mg import build_hierarchy
from femus_tpu.algebra.sparse import op_from_scipy
from femus_tpu.algebra.transfer import (block_diag_prolongation,
                                        build_ptap_schedule, op_pair_from_scipy,
                                        prolongation_scipy)
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh


def exact(x):
    return jnp.sin(jnp.pi * x[:, 0]) * jnp.sin(jnp.pi * x[:, 1])


def rhs(x):
    return 2 * jnp.pi ** 2 * exact(x)


def test_prolongation_interpolates():
    """P applied to coarse nodal values of a quadratic reproduces fine nodal
    values exactly (biquadratic family)."""
    ml = MultiLevelMesh(unit_box((2, 2), "quad"), 2)
    cm, fm = ml.levels
    P = prolongation_scipy(cm, fm, "biquadratic")
    f = lambda c: c[:, 0] ** 2 + 0.5 * c[:, 1] ** 2 + c[:, 0] * c[:, 1]
    uc = f(cm.coords[cm.dofmap("biquadratic").nodes])
    uf_expect = f(fm.coords[fm.dofmap("biquadratic").nodes])
    assert np.allclose(P @ uc, uf_expect, atol=1e-10)


@pytest.mark.parametrize("geom", ["quad", "tri", "hex"])
def test_ptap_schedule_matches_scipy(geom):
    dim = 2 if geom in ("quad", "tri") else 3
    ml = MultiLevelMesh(unit_box((2,) * dim, geom), 2)
    cm, fm = ml.levels
    asm = Assembler(fm, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic", rhs=rhs if dim == 2 else None))
    R, data = jax.jit(asm.make_assemble_fn())(jnp.zeros(asm.n_dofs))
    P = prolongation_scipy(cm, fm, "biquadratic")
    sched = build_ptap_schedule(asm.pattern, P)
    got = np.asarray(sched.apply(data))
    # scipy reference
    A = sp.csr_matrix((np.asarray(data).ravel()[asm.pattern.csr_to_ell_slots()],
                       asm.pattern.indices, asm.pattern.indptr),
                      shape=(asm.n_dofs, asm.n_dofs))
    C = (P.T @ A @ P).toarray()
    got_dense = np.zeros_like(C)
    cp = sched.coarse_pattern
    rows = np.repeat(np.arange(cp.n_rows), cp.width)
    np.add.at(got_dense, (rows, cp.cols.ravel()), got.ravel())
    assert np.allclose(got_dense, C, atol=1e-10)


def test_ptap_schedule_f32_mixed_scales_exact_per_segment():
    """f32 PtAP apply must reduce PER SEGMENT, never by differencing a
    global prefix (r5 regression: at FSI's mixed entry scales the cumsum
    path zeroed 1922 coarse rows exactly and the coarse LU went singular).
    Scale the fine data by alternating 1e4/1e-4 row factors and require
    every f32 coarse slot to match the f64 reference to f32 accuracy of
    the SEGMENT's own magnitude — the cumsum path fails this at ~1e-1
    absolute."""
    ml = MultiLevelMesh(unit_box((2, 2), "quad"), 2)
    cm, fm = ml.levels
    asm = Assembler(fm, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic"))
    _, data = jax.jit(asm.make_assemble_fn())(jnp.zeros(asm.n_dofs))
    scale = np.where(np.arange(asm.pattern.n_rows) % 2 == 0, 1e4, 1e-4)
    data = jnp.asarray(np.asarray(data) * scale[:, None])
    P = prolongation_scipy(cm, fm, "biquadratic")
    sched = build_ptap_schedule(asm.pattern, P)
    ref = np.asarray(sched.apply(data))                       # f64 path
    got = np.asarray(sched.apply(data.astype(jnp.float32)))   # f32 path
    tol = 2e-5 * np.maximum(np.abs(ref), np.abs(ref).max(axis=1,
                                                          keepdims=True)
                            * 1e-6)
    assert (np.abs(got - ref) <= tol + 1e-30).all(), \
        np.abs(got - ref).max()
    # and the zero slots stay exactly zero, nonzero slots stay nonzero
    assert ((ref == 0) == (got == 0)).all()


@pytest.mark.parametrize("smoother", ["jacobi", "chebyshev"])
def test_mg_preconditioned_cg_poisson(smoother):
    n_levels = 3
    ml = MultiLevelMesh(unit_box((4, 4), "quad"), n_levels)
    fam = "biquadratic"
    asms, masks = [], []
    for mesh in ml.levels:
        a = Assembler(mesh, [Unknown("u", fam)], quad_order="fifth")
        a.set_volume_form(poisson("u", fam, rhs=rhs))
        generate_bdc(a, lambda var, x, grp, t: (True, 0.0))
        asms.append(a)
        masks.append(a.dirichlet_mask)
    fine = asms[-1]
    u0 = jnp.asarray(apply_dirichlet_values(fine, np.zeros(fine.n_dofs)))
    Rv, data = jax.jit(fine.make_assemble_fn())(u0)
    A = fine.op_with(data)

    # build top-down: each schedule consumes the ELL pattern of the level
    # above (assembly pattern at the finest, schedule coarse_pattern below)
    transfers = [None] * (n_levels - 1)
    pat_above = fine.pattern
    for l in range(n_levels - 2, -1, -1):
        P = block_diag_prolongation(ml.levels[l], ml.levels[l + 1], fine.unknowns)
        P = P.tolil()
        P[masks[l + 1], :] = 0.0
        P[:, masks[l]] = 0.0
        P = P.tocsr()
        P.eliminate_zeros()
        Pop, Rop = op_pair_from_scipy(P)
        sched = build_ptap_schedule(pat_above, P)
        transfers[l] = (Pop, Rop, sched)
        pat_above = sched.coarse_pattern

    h = build_hierarchy(A, transfers, smoother=smoother,
                        dir_masks=[jnp.asarray(m) for m in masks[:-1]])
    M = h.as_preconditioner("V")
    x, info = cg(lambda v: A @ v, -Rv, M=M, tol=1e-10, maxiter=100)
    iters = int(info.iters)
    assert iters <= 20, iters
    d = A.diagonal()
    xj, _ = cg(lambda v: A @ v, -Rv, M=lambda r: r / d, tol=1e-12, maxiter=4000)
    assert np.allclose(np.asarray(x), np.asarray(xj), atol=1e-7)
    # iteration-count advantage on a rough RHS (a smooth RHS spans too few
    # eigenmodes to stress the solvers)
    rng = np.random.default_rng(0)
    br = jnp.asarray(np.where(fine.dirichlet_mask, 0.0, rng.normal(size=fine.n_dofs)))
    _, im = cg(lambda v: A @ v, br, M=M, tol=1e-10, maxiter=200)
    _, ij = cg(lambda v: A @ v, br, M=lambda r: r / d, tol=1e-10, maxiter=4000)
    assert int(im.iters) <= 25, int(im.iters)
    assert int(im.iters) * 3 < int(ij.iters), (int(im.iters), int(ij.iters))


@pytest.mark.parametrize("low", ["float32", "bfloat16"])
@pytest.mark.slow
def test_mixed_precision_vcycle(low):
    """Mixed precision (the TPU-first pattern): the V-cycle runs in fp32 or
    bf16 while the outer CG stays fp64 — final accuracy is unchanged and the
    iteration count stays multigrid-like."""
    n_levels = 3
    ml = MultiLevelMesh(unit_box((4, 4), "quad"), n_levels)
    fam = "biquadratic"
    asms, masks = [], []
    for mesh in ml.levels:
        a = Assembler(mesh, [Unknown("u", fam)], quad_order="fifth")
        a.set_volume_form(poisson("u", fam, rhs=rhs))
        generate_bdc(a, lambda var, x, grp, t: (True, 0.0))
        asms.append(a)
        masks.append(a.dirichlet_mask)
    fine = asms[-1]
    u0 = jnp.asarray(apply_dirichlet_values(fine, np.zeros(fine.n_dofs)))
    Rv, data = jax.jit(fine.make_assemble_fn())(u0)
    A = fine.op_with(data)
    transfers = [None] * (n_levels - 1)
    pat_above = fine.pattern
    for l in range(n_levels - 2, -1, -1):
        P = block_diag_prolongation(ml.levels[l], ml.levels[l + 1],
                                    fine.unknowns).tolil()
        P[masks[l + 1], :] = 0.0
        P[:, masks[l]] = 0.0
        P = P.tocsr()
        P.eliminate_zeros()
        Pop, Rop = op_pair_from_scipy(P)
        sched = build_ptap_schedule(pat_above, P)
        transfers[l] = (Pop, Rop, sched)
        pat_above = sched.coarse_pattern
    dmasks = [jnp.asarray(m) for m in masks[:-1]]

    h64 = build_hierarchy(A, transfers, smoother="chebyshev",
                          dir_masks=dmasks)
    hlo = build_hierarchy(A, transfers, smoother="chebyshev",
                          dir_masks=dmasks,
                          compute_dtype=jnp.dtype(low))
    x64, i64 = cg(lambda v: A @ v, -Rv, M=h64.as_preconditioner("V"),
                  tol=1e-11, maxiter=200)
    xlo, ilo = cg(lambda v: A @ v, -Rv, M=hlo.as_preconditioner("V"),
                  tol=1e-11, maxiter=200)
    # identical final accuracy (outer Krylov precision governs)
    assert np.allclose(np.asarray(xlo), np.asarray(x64), atol=1e-9)
    # multigrid-like iteration counts: low precision costs at most ~2x
    budget = 2 * int(i64.iters) + (6 if low == "bfloat16" else 2)
    assert int(ilo.iters) <= budget, (int(ilo.iters), int(i64.iters))


def test_all_cycle_types_converge():
    """V / W / F(full) / additive / kaskade (reference MgSmootherType ->
    PCMGSetType, LinearEquationSolverPetsc.cpp:185-215) all drive the same
    Poisson problem to the same solution."""
    from femus_tpu.mesh.multilevel import MultiLevelMesh
    from femus_tpu.systems.problem import MultiLevelProblem
    from femus_tpu.systems.solution import MultiLevelSolution
    from femus_tpu.systems.system import LinearImplicitSystem
    from femus_tpu.assembly import forms as _forms

    ml_mesh = MultiLevelMesh(unit_box((6, 6), "quad"), 3)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic")
    ml_sol.initialize("u")
    ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
    ml_sol.generate_bdc("u")
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys_ = prob.add_system(LinearImplicitSystem, "Poisson")
    sys_.add_unknown("u")
    sys_.set_assembly(_forms.poisson(rhs=lambda x: 1.0 + 0.0 * x[..., 0]))
    sys_.init()
    norms = {}
    for cyc in ("V", "W", "F", "additive", "kaskade"):
        sys_.config.mg_cycle = cyc
        sys_._step_fns = {}
        info = sys_.solve()
        norms[cyc] = np.linalg.norm(ml_sol.sol[-1]["u"])
        assert info["residual"] < 1e-6, (cyc, info)
    ref = norms["V"]
    for cyc, nv in norms.items():
        assert abs(nv - ref) < 1e-8 * ref, (cyc, nv, ref)
