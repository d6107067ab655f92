"""Saddle-point solver infrastructure: Vanka block smoother, field-split /
Schur preconditioners, MG with Vanka on Stokes (reference PCASM +
PCFIELDSPLIT equivalents)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.assembly.bc import apply_dirichlet_values, generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import navier_stokes
from femus_tpu.algebra.krylov import fgmres, gmres
from femus_tpu.algebra.fieldsplit import (additive_fieldsplit, jacobi_pc,
                                          schur_fieldsplit, splits_from_offsets)
from femus_tpu.algebra.vanka import build_element_blocks, vanka_smoother
from femus_tpu.mesh.generation import unit_box

pi = np.pi


def build_stokes(n=8, stokes=True):
    mesh = unit_box((n, n), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic"),
                           Unknown("v", "biquadratic"),
                           Unknown("p", "linear")], quad_order="fifth")

    def force(x):
        return jnp.stack([jnp.sin(pi * x[:, 1]), jnp.cos(pi * x[:, 0])], axis=-1)

    asm.set_volume_form(navier_stokes(("u", "v"), "p", nu=1.0, force=force,
                                      stokes=stokes))

    def bc(var, x, grp, t):
        if var == "p":
            return False, 0.0
        return True, (1.0 if (var == "u" and grp == 4) else 0.0)

    generate_bdc(asm, bc)
    asm.dirichlet_mask[asm.offsets["p"]] = True   # pressure pin
    u0 = jnp.asarray(apply_dirichlet_values(asm, np.zeros(asm.n_dofs_pad)))
    R, data = jax.jit(asm.make_assemble_fn())(u0)
    A = asm.op_with(data)
    return asm, A, -R, u0


def reference_solution(asm, A, b):
    Ad = np.asarray(A.to_dense())[:asm.n_dofs, :asm.n_dofs]
    return np.linalg.solve(Ad, np.asarray(b)[:asm.n_dofs])


@pytest.mark.slow
def test_vanka_smoother_converges():
    asm, A, b, u0 = build_stokes(4)
    blocks = build_element_blocks(asm, elems_per_block=2)
    sm = vanka_smoother(A, blocks, omega=0.8, iters=1)
    x = jnp.zeros_like(b)
    r0 = float(jnp.linalg.norm(b))
    for _ in range(60):
        x = sm(b, x)
    r = float(jnp.linalg.norm(b - A @ x))
    assert r < 0.05 * r0, (r, r0)


def test_schur_fieldsplit_gmres():
    asm, A, b, u0 = build_stokes(8)
    splits = splits_from_offsets(asm, {"vel": ["u", "v"], "press": ["p"]})
    M = schur_fieldsplit(A, splits[0], splits[1], jacobi_pc(A, jnp.asarray(splits[0].idx)),
                         fact="full", schur_iters=15, u_iters=6)
    # inner CG makes M nonlinear -> flexible GMRES required
    x, info = fgmres(A.matvec, b, M=M, tol=1e-10, restart=40, max_restarts=10)
    want = reference_solution(asm, A, b)
    got = np.asarray(x)[:asm.n_dofs]
    assert np.linalg.norm(got - want) < 1e-6 * max(1.0, np.linalg.norm(want))
    # compare against plain-Jacobi GMRES iterations
    d = A.diagonal()
    ds = jnp.where(jnp.abs(d) < 1e-30, 1.0, d)
    xj, infoj = gmres(A.matvec, b, M=lambda r: r / ds, tol=1e-10, restart=40,
                      max_restarts=25)
    assert int(info.iters) < int(infoj.iters), (int(info.iters), int(infoj.iters))


def test_additive_fieldsplit_runs():
    asm, A, b, u0 = build_stokes(4)
    splits = splits_from_offsets(asm, {"vel": ["u", "v"], "press": ["p"]})
    M = additive_fieldsplit(A, splits, [jacobi_pc(A, jnp.asarray(s.idx))
                                        for s in splits])
    z = M(b)
    assert np.isfinite(np.asarray(z)).all()


def test_mg_vanka_stokes():
    """2-level MG with Vanka smoothing as GMRES preconditioner on Stokes."""
    from femus_tpu.algebra.mg import MGHierarchy, MGLevel, build_hierarchy
    from femus_tpu.algebra.transfer import (block_diag_prolongation,
                                            build_ptap_schedule,
                                            op_pair_from_scipy)
    from femus_tpu.mesh.multilevel import MultiLevelMesh
    from femus_tpu.algebra.sparse import SparseOp

    ml = MultiLevelMesh(unit_box((4, 4), "quad"), 2)
    unknowns = [Unknown("u", "biquadratic"), Unknown("v", "biquadratic"),
                Unknown("p", "linear")]

    def bc(var, x, grp, t):
        if var == "p":
            return False, 0.0
        return True, (1.0 if (var == "u" and grp == 4) else 0.0)

    asms, masks = [], []
    for mesh in ml.levels:
        a = Assembler(mesh, unknowns, quad_order="fifth")
        a.set_volume_form(navier_stokes(("u", "v"), "p", nu=1.0, stokes=True))
        generate_bdc(a, bc)
        a.dirichlet_mask[a.offsets["p"]] = True
        asms.append(a)
        masks.append(a.dirichlet_mask)
    fine = asms[1]
    u0 = jnp.asarray(apply_dirichlet_values(fine, np.zeros(fine.n_dofs_pad)))
    R, data = jax.jit(fine.make_assemble_fn())(u0)
    A = fine.op_with(data)

    P = block_diag_prolongation(ml.levels[0], ml.levels[1], unknowns).tolil()
    P[masks[1], :] = 0.0
    P[:, masks[0]] = 0.0
    P = P.tocsr()
    P.eliminate_zeros()
    Pop, Rop = op_pair_from_scipy(P)
    sched = build_ptap_schedule(fine.pattern, P)
    # hierarchy with Vanka smoothers on both levels
    data_c = sched.apply(A.data)
    from femus_tpu.algebra.mg import apply_dirichlet_identity
    Ac = SparseOp(data_c, jnp.asarray(sched.coarse_pattern.cols),
                  sched.coarse_pattern.n_cols)
    Ac = apply_dirichlet_identity(Ac, jnp.asarray(sched.coarse_pattern.valid),
                                  jnp.asarray(masks[0]))
    smf = vanka_smoother(A, build_element_blocks(asms[1], 2), omega=0.9)
    h = MGHierarchy([MGLevel(Ac, None, None, None),
                     MGLevel(A, Pop, Rop, smf)], n_pre=2, n_post=2)
    h.setup_coarse()
    M = h.as_preconditioner("V")
    x, info = gmres(A.matvec, -R, M=M, tol=1e-10, restart=30, max_restarts=10)
    want = reference_solution(fine, A, -R)
    got = np.asarray(x)[:fine.n_dofs]
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1)
    assert rel < 1e-6, rel
    assert int(info.iters) <= 60, int(info.iters)
