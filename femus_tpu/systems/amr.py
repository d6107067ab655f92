"""AMR solve driver: solve -> estimate -> flag -> selectively refine.

Reference counterpart: the AMR branch of ``LinearImplicitSystem::MGsolve``
(LinearImplicitSystem.cpp:529-577 AddAMRLevel;
Solution::FlagAMRRegionBasedOnErroNormAdaptive Solution.cpp:843;
MeshRefinement::FlagElementsToRefineBasedOnError MeshRefinement.cpp:137-186).

TPU-idiomatic shape: each AMR cycle is a full host re-setup + re-jit (static
shapes per cycle, as SURVEY.md §7 hard-part 5 prescribes); within a cycle the
conforming reduced operator C^T A C is computed on device through the same
precomputed-schedule PtAP used by multigrid, and the solve is a jitted
preconditioned CG in the free-dof space.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..algebra.krylov import cg
from ..algebra.transfer import (block_diag_prolongation,
                                build_ptap_schedule, op_pair_from_scipy)
from ..assembly.bc import apply_dirichlet_values, generate_bdc
from ..assembly.engine import Assembler, Unknown
from ..fe.basis import get_basis
from ..fe.geom import GEOMS
from ..fe.quadrature import gauss
from ..mesh.amr import flag_by_error, hanging_constraints, refine_selective
from ..mesh.mesh import Mesh


# ---------------------------------------------------------------------------
# Kelly-type gradient-jump error indicator (host, setup-scale work)
# ---------------------------------------------------------------------------

def kelly_indicator(mesh: Mesh, family: str, u: np.ndarray,
                    quad_order: int = 3) -> np.ndarray:
    """eta_e^2 = sum over matched interior faces  h_f * 0.5 * int [du/dn]^2.

    Refinement-boundary faces (coarse/fine mismatch) are skipped — their
    jump is controlled by the hanging constraints.  Returns per-element eta.
    """
    g = GEOMS[mesh.geom]
    b = get_basis(mesh.geom, family)
    dm = mesh.dofmap(family)
    fam_local = g.family_nodes[family]

    # matched interior face pairs
    keys, elems, ifaces = [], [], []
    for fi, (fg, f_bq) in enumerate(g.faces):
        nvf = GEOMS[fg].n_verts
        keys.append(np.sort(mesh.conn[:, np.asarray(f_bq[:nvf])], axis=1))
        elems.append(np.arange(mesh.n_elems))
        ifaces.append(np.full(mesh.n_elems, fi))
    keys = np.concatenate(keys); elems = np.concatenate(elems)
    ifaces = np.concatenate(ifaces)
    order = np.lexsort(keys.T[::-1])
    keys, elems, ifaces = keys[order], elems[order], ifaces[order]
    same = np.all(keys[1:] == keys[:-1], axis=1)
    p1, p2 = np.where(same)[0], np.where(same)[0] + 1

    eta2 = np.zeros(mesh.n_elems)
    # group by (face geom) — single-geom mesh: all faces same geom
    fg0 = g.faces[0][0]
    qpts, qw = gauss(fg0, quad_order)                    # face-ref quadrature
    fbas = get_basis(fg0, "biquadratic")
    fphi = np.asarray(fbas.eval(qpts))                   # (nq, n_face_bq)
    fdphi = np.asarray(fbas.eval_grad(qpts))             # (nq, n_face_bq, dim-1)

    e1a, f1a, e2a, f2a = elems[p1], ifaces[p1], elems[p2], ifaces[p2]
    g1, n1, dS1 = _side_batch(mesh, b, dm, fam_local, u, e1a, f1a, fphi, fdphi)
    g2, _, _ = _side_batch(mesh, b, dm, fam_local, u, e2a, f2a, fphi, fdphi)
    jump = np.einsum("mqx,mqx->mq", g1 - g2, n1)         # (m, nq)
    h = dS1.sum(axis=1)                                  # ~ face measure
    eta = h * np.einsum("q,mq,mq->m", qw, jump ** 2, dS1)
    np.add.at(eta2, e1a, 0.5 * eta)
    np.add.at(eta2, e2a, 0.5 * eta)
    return np.sqrt(eta2)


def _side_batch(mesh, b, dm, fam_local, u, elems, ifaces, fphi, fdphi):
    """Batched one-sided face-gradient evaluation: physical gradients,
    outward-ish normals, and surface measure at face quadrature points for
    every (element, local-face) pair at once — the vectorized replacement
    for the per-pair Python loop (grouped by local face index, of which a
    geom has at most 6)."""
    g = GEOMS[mesh.geom]
    geo_b = get_basis(mesh.geom, "biquadratic")
    m, nq = len(elems), fphi.shape[0]
    dim = mesh.dim
    gphys = np.zeros((m, nq, dim))
    nrm_all = np.zeros((m, nq, dim))
    dS_all = np.zeros((m, nq))
    for fi in np.unique(ifaces):
        sel = ifaces == fi
        E = elems[sel]
        fg, f_bq = g.faces[int(fi)]
        f_bq = np.asarray(f_bq)
        xi = fphi @ g.ref_nodes[f_bq]                    # (nq, dim)
        dphi_e = np.asarray(b.eval_grad(xi))             # (nq, nd, dim)
        geo_dphi = np.asarray(geo_b.eval_grad(xi))       # (nq, nd_geo, dim)
        conn_E = mesh.conn[E]                            # (me, nd_geo)
        coords_E = mesh.coords[conn_E]                   # (me, nd_geo, dim)
        J = np.einsum("qnd,mnx->mqxd", geo_dphi, coords_E)
        Jinv = np.linalg.inv(J)                          # (me, nq, d, x)
        dofs_E = u[dm.node_to_dof[conn_E[:, fam_local]]]  # (me, nd)
        gref = np.einsum("qnd,mn->mqd", dphi_e, dofs_E)
        gphys[sel] = np.einsum("mqdx,mqd->mqx", Jinv, gref)
        fcoords = mesh.coords[conn_E[:, f_bq]]           # (me, nfb, dim)
        T = np.einsum("qns,mnx->mqxs", fdphi, fcoords)   # (me, nq, dim, dim-1)
        if T.shape[3] == 1:
            dS = np.linalg.norm(T[:, :, :, 0], axis=2)
            nrm = np.stack([T[:, :, 1, 0], -T[:, :, 0, 0]], axis=2)
        else:
            nrm = np.cross(T[:, :, :, 0], T[:, :, :, 1])
            dS = np.linalg.norm(nrm, axis=2)
        nrm_all[sel] = nrm / np.maximum(dS[:, :, None], 1e-300)
        dS_all[sel] = dS
    return gphys, nrm_all, dS_all


# ---------------------------------------------------------------------------
# One conforming solve on a (possibly mixed-level) mesh
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AMRResult:
    mesh: Mesh
    u: np.ndarray                 # stacked dof vector (all dofs, conforming)
    eta: np.ndarray               # per-element indicator
    n_free: int
    info: Dict


def solve_conforming(mesh: Mesh, unknowns: Sequence[Unknown],
                     volume_form, bc_fn, quad_order: str = "fifth",
                     tol: float = 1e-10, maxiter: int = 2000,
                     face_form=None) -> Tuple[np.ndarray, Dict]:
    """Assemble on all elements, reduce by the hanging constraint operator
    C (block-diagonal over unknowns), solve C^T A C in free space, prolong."""
    asm = Assembler(mesh, list(unknowns), quad_order=quad_order)
    asm.set_volume_form(volume_form)
    if face_form is not None:
        asm.set_face_form(face_form)
    generate_bdc(asm, bc_fn)
    blocks, frees = [], []
    off = 0
    for u in unknowns:
        Cb, fb = hanging_constraints(mesh, u.family)
        blocks.append(Cb)
        frees.append(fb + off)
        off += Cb.shape[0]
    C = sp.block_diag(blocks, format="csr")
    free_idx = np.concatenate(frees)
    n_hang = C.shape[0] - C.shape[1]

    u0 = np.asarray(apply_dirichlet_values(asm, np.zeros(asm.n_dofs)))
    # constraint-consistent start: hanging dofs interpolate their masters
    # (Dirichlet values reach boundary-adjacent hanging dofs through C)
    u0 = jnp.asarray(C @ u0[free_idx])
    assemble = jax.jit(asm.make_assemble_fn())
    R, data = assemble(u0)
    A = asm.op_with(data)
    if n_hang == 0:
        d = A.diagonal()
        delta, si = cg(lambda x: A @ x, -R, M=lambda r: r / d, tol=tol,
                       maxiter=maxiter)
        u = np.asarray(u0 + delta)
        return u, {"n_hanging": 0, "iterations": int(si.iters),
                   "residual": float(si.residual)}

    Cop, CTop = op_pair_from_scipy(C)
    sched = build_ptap_schedule(asm.pattern, C)
    from ..algebra.sparse import op_from_pattern
    Ardata = sched.apply(data)                           # C^T A C (ELL data)
    # re-impose Dirichlet identity on reduced rows/cols: the Galerkin
    # reduction distributes hanging equations onto masters, which must not
    # touch Dirichlet masters' identity rows
    mask_f = np.asarray(asm.dirichlet_mask)[free_idx]
    cpat = sched.coarse_pattern
    touched = (mask_f[:, None] | mask_f[cpat.cols]) & cpat.valid
    diag_slot = (cpat.cols == np.arange(cpat.n_rows)[:, None]) & cpat.valid
    setdiag = diag_slot & mask_f[:, None]
    keep = np.where(touched & ~setdiag, 0.0, 1.0)
    setdiag = jnp.asarray(setdiag.astype(Ardata.dtype))
    Ardata = Ardata * jnp.asarray(keep) * (1 - setdiag) + setdiag
    Ar = op_from_pattern(cpat, Ardata)
    Rr = CTop @ R
    Rr = jnp.where(jnp.asarray(mask_f), 0.0, Rr)
    d = Ar.diagonal()
    d = jnp.where(jnp.abs(d) > 1e-300, d, 1.0)
    delta_f, si = cg(lambda x: Ar @ x, -Rr, M=lambda r: r / d, tol=tol,
                     maxiter=maxiter)
    # prolong: full-space solution (hanging dofs interpolated); u0 carries
    # Dirichlet values, delta in free space
    u = np.asarray(u0 + (Cop @ delta_f))
    return u, {"n_hanging": int(n_hang), "iterations": int(si.iters),
               "residual": float(si.residual)}


def amr_loop(mesh: Mesh, unknowns: Sequence[Unknown], volume_form, bc_fn,
             max_cycles: int = 4, threshold: float = 0.3,
             mode: str = "fraction", quad_order: str = "fifth",
             estimator: Optional[Callable] = None,
             region_fn: Optional[Callable] = None,
             tol: float = 1e-10) -> List[AMRResult]:
    """solve -> estimate -> flag -> refine, ``max_cycles`` times.

    ``region_fn(centroids) -> bool mask`` overrides the error estimator
    (reference SetRefinementFlag callback); otherwise ``estimator`` (default
    kelly_indicator on the first unknown) + flag_by_error(threshold, mode).
    """
    results: List[AMRResult] = []
    for cyc in range(max_cycles):
        u, info = solve_conforming(mesh, unknowns, volume_form, bc_fn,
                                   quad_order=quad_order, tol=tol)
        fam0 = unknowns[0].family
        dm0 = mesh.dofmap(fam0)
        u0_slice = u[:dm0.n_dofs]
        if estimator is None:
            eta = kelly_indicator(mesh, fam0, u0_slice)
        else:
            eta = estimator(mesh, u)
        results.append(AMRResult(mesh, u, eta, info.get("n_free", -1), info))
        if cyc == max_cycles - 1:
            break
        if region_fn is not None:
            cent = mesh.coords[mesh.conn[:, :GEOMS[mesh.geom].n_verts]].mean(axis=1)
            flags = np.asarray(region_fn(cent), bool)
        else:
            flags = flag_by_error(eta, threshold, mode=mode)
        if not np.any(flags):
            break
        mesh = refine_selective(mesh, flags)
    return results


def _reduced_system(mesh, unknowns, volume_form, bc_fn, quad_order="fifth",
                    face_form=None):
    """(assembler, C, free_idx, mask_f, reduced pattern+schedule) for one
    AMR level — the hanging-constraint reduction of solve_conforming,
    factored out so the MG-on-AMR hierarchy can build every level."""
    asm = Assembler(mesh, list(unknowns), quad_order=quad_order)
    asm.set_volume_form(volume_form)
    if face_form is not None:
        asm.set_face_form(face_form)
    generate_bdc(asm, bc_fn)
    blocks, frees = [], []
    off = 0
    for u in unknowns:
        Cb, fb = hanging_constraints(mesh, u.family)
        blocks.append(Cb)
        frees.append(fb + off)
        off += Cb.shape[0]
    C = sp.block_diag(blocks, format="csr")
    free_idx = np.concatenate(frees)
    mask_f = np.asarray(asm.dirichlet_mask)[free_idx]
    sched = build_ptap_schedule(asm.pattern, C)
    return asm, C, free_idx, mask_f, sched


def _reduced_op(asm, C, free_idx, mask_f, sched, u_all):
    """Assemble at u_all and Galerkin-reduce by C with Dirichlet identity
    restored on the reduced rows (same algebra as solve_conforming)."""
    from ..algebra.sparse import op_from_pattern
    assemble = asm.make_assemble_fn()
    R, data = assemble(u_all)
    Ardata = sched.apply(data)
    cpat = sched.coarse_pattern
    touched = (mask_f[:, None] | mask_f[cpat.cols]) & cpat.valid
    diag_slot = (cpat.cols == np.arange(cpat.n_rows)[:, None]) & cpat.valid
    setdiag = diag_slot & mask_f[:, None]
    keep = np.where(touched & ~setdiag, 0.0, 1.0)
    sd = jnp.asarray(setdiag.astype(Ardata.dtype))
    Ardata = Ardata * jnp.asarray(keep) * (1 - sd) + sd
    Cop, CTop = op_pair_from_scipy(C)
    Rr = CTop @ R
    Rr = jnp.where(jnp.asarray(mask_f), 0.0, Rr)
    return op_from_pattern(cpat, Ardata), Rr, Cop


def solve_mg_amr(meshes, unknowns, volume_form, bc_fn, quad_order="fifth",
                 tol: float = 1e-10, maxiter: int = 200,
                 n_pre: int = 2, n_post: int = 2):
    """V-cycle-preconditioned CG ACROSS the AMR level chain (reference
    MG-on-AMR: _PPamr/_RRamr fold the hanging constraints into the transfer
    operators, LinearImplicitSystem.cpp:529-577; MGAMR app).

    meshes: the AMR chain, coarsest (uniform) first, each produced by
    refine_selective of the previous.  Every level assembles on its own
    mesh and reduces by its own constraint operator; transfers between
    reduced spaces are P_red = (P_amr @ C_coarse)[free_fine, :] — the
    embedding prolongation (identity on copied elements) composed with the
    coarse constraint interpolation.  Returns (u_all_fine, info).
    """
    levels = [_reduced_system(m, unknowns, volume_form, bc_fn, quad_order)
              for m in meshes]
    ops, rhs = [], None
    Cop_f = None
    for li, (asm, C, free_idx, mask_f, sched) in enumerate(levels):
        u0 = np.asarray(apply_dirichlet_values(asm, np.zeros(asm.n_dofs)))
        u0 = jnp.asarray(C @ u0[free_idx])
        A_r, R_r, Cop = _reduced_op(asm, C, free_idx, mask_f, sched,
                                    u0)
        ops.append(A_r)
        if li == len(levels) - 1:
            rhs, Cop_f, u0_f = R_r, Cop, u0
    pr_pairs = []
    for l in range(len(meshes) - 1):
        asm_c, C_c, free_c, mfc, _ = levels[l]
        asm_f, C_f, free_f, mff, _ = levels[l + 1]
        P_all = block_diag_prolongation(meshes[l], meshes[l + 1], unknowns)
        from ..algebra.transfer import mask_prolongation
        P_red = (P_all @ C_c).tocsr()[free_f, :]
        Pm = mask_prolongation(P_red, mff, mfc)
        pr_pairs.append(op_pair_from_scipy(Pm))
    from ..algebra.mg import build_hierarchy_from_ops
    h = build_hierarchy_from_ops(ops, pr_pairs, smoother="chebyshev",
                                 n_pre=n_pre, n_post=n_post)
    M = h.as_preconditioner("V")
    A = ops[-1]
    delta, si = cg(lambda x: A @ x, -rhs, M=M, tol=tol, maxiter=maxiter)
    asm, C, free_idx, mask_f, sched = levels[-1]
    u = np.asarray(u0_f + (Cop_f @ delta))
    return u, {"iterations": int(si.iters), "residual": float(si.residual),
               "n_levels": len(meshes)}
