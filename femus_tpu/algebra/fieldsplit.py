"""Field-split / Schur block preconditioners over the stacked dof layout.

Reference: ``FieldSplitTree`` (FieldSplitTree.hpp:42-178): recursive
PCFIELDSPLIT with additive/multiplicative/Schur nodes, index sets built from
the KKoffset block layout, Schur factorization and preconditioner type
selectors (:69-70).  Here splits are static index arrays into the stacked
vector; combinators return preconditioner closures M(r) -> z usable by the
Krylov drivers and block sub-solves are Chebyshev/Jacobi/CG applications of
masked sub-operators — no matrices are ever re-assembled per split.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .krylov import cg, richardson
from .sparse import SparseOp


@dataclasses.dataclass
class Split:
    name: str
    idx: np.ndarray                 # global dof indices of this split


def splits_from_offsets(assembler, groups: Dict[str, Sequence[str]]) -> List[Split]:
    """Build splits from unknown names using the assembler's KKoffset layout,
    e.g. {"vel": ["u", "v"], "press": ["p"]}."""
    out = []
    for name, vars_ in groups.items():
        parts = []
        for v in vars_:
            off = assembler.offsets[v]
            nd = assembler.dofmaps[v].n_dofs
            parts.append(np.arange(off, off + nd))
        out.append(Split(name, np.concatenate(parts)))
    return out


def sub_operator(A: SparseOp, idx: jnp.ndarray, n: int) -> Callable:
    """Masked block operator: x_s -> (A @ E x_s)[idx] (E = embedding)."""

    def op(xs):
        x = jnp.zeros(n, xs.dtype).at[idx].set(xs)
        return (A @ x)[idx]

    return op


def coupling_operator(A: SparseOp, row_idx, col_idx, n: int) -> Callable:
    def op(xs):
        x = jnp.zeros(n, xs.dtype).at[col_idx].set(xs)
        return (A @ x)[row_idx]

    return op


def jacobi_pc(A: SparseOp, idx) -> Callable:
    d = A.diagonal()[idx]
    dsafe = jnp.where(jnp.abs(d) < 1e-30, 1.0, d)
    return lambda r: r / dsafe


def additive_fieldsplit(A: SparseOp, splits: Sequence[Split],
                        sub_pcs: Sequence[Callable]) -> Callable:
    """Block-Jacobi over splits (PC_COMPOSITE_ADDITIVE)."""
    n = A.n_rows
    idxs = [jnp.asarray(s.idx) for s in splits]

    def M(r):
        z = jnp.zeros_like(r)
        for idx, pc in zip(idxs, sub_pcs):
            z = z.at[idx].set(pc(r[idx]))
        return z

    return M


def multiplicative_fieldsplit(A: SparseOp, splits: Sequence[Split],
                              sub_pcs: Sequence[Callable]) -> Callable:
    """Block Gauss-Seidel over splits (PC_COMPOSITE_MULTIPLICATIVE)."""
    n = A.n_rows
    idxs = [jnp.asarray(s.idx) for s in splits]

    def M(r):
        z = jnp.zeros_like(r)
        for idx, pc in zip(idxs, sub_pcs):
            rr = (r - A @ z)[idx]
            z = z.at[idx].add(pc(rr))
        return z

    return M


def schur_fieldsplit(A: SparseOp, split_u: Split, split_p: Split,
                     pc_u: Callable, fact: str = "full",
                     schur_iters: int = 10, u_iters: int = 4) -> Callable:
    """Schur-complement preconditioner for [[F, B'],[B, C]] saddle systems
    (PCFIELDSPLIT type SCHUR; SetSchurFactorizationType semantics).

    The Schur complement S = C - B diag(F)^{-1} B' is applied matrix-free and
    solved approximately with ``schur_iters`` CG iterations preconditioned by
    its own diagonal estimate; F-solves use ``u_iters`` Richardson sweeps of
    pc_u.  fact: "diag" | "lower" | "upper" | "full" (LDU).
    """
    n = A.n_rows
    iu = jnp.asarray(split_u.idx)
    ip = jnp.asarray(split_p.idx)
    F = sub_operator(A, iu, n)
    Bt = coupling_operator(A, iu, ip, n)    # u <- p
    B = coupling_operator(A, ip, iu, n)     # p <- u
    C = sub_operator(A, ip, n)
    dF = A.diagonal()[iu]
    dFs = jnp.where(jnp.abs(dF) < 1e-30, 1.0, dF)

    def S_neg(xp):
        # -(C - B diag(F)^-1 B'): positive (semi)definite for saddle systems
        return B(Bt(xp) / dFs) - C(xp)

    def solve_F(ru):
        return richardson(F, ru, M=pc_u, iters=u_iters)

    def solve_S(rp):
        # S z = rp  <=>  S_neg z = -rp (keeps CG on an SPD operator)
        z, _ = cg(S_neg, -rp, tol=1e-2, maxiter=schur_iters)
        return z

    def M(r):
        ru, rp = r[iu], r[ip]
        if fact == "diag":
            zu, zp = solve_F(ru), solve_S(rp)
        elif fact == "lower":
            zu = solve_F(ru)
            zp = solve_S(rp - B(zu))
        elif fact == "upper":
            zp = solve_S(rp)
            zu = solve_F(ru - Bt(zp))
        else:  # full LDU
            zu0 = solve_F(ru)
            zp = solve_S(rp - B(zu0))
            zu = zu0 - solve_F(Bt(zp))
        return jnp.zeros_like(r).at[iu].set(zu).at[ip].set(zp)

    return M
