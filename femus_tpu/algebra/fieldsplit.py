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


# ---------------------------------------------------------------------------
# Recursive FieldSplitTree (reference FieldSplitTree.hpp:42-178): nodes are
# additive / multiplicative / Schur combinations of child splits; leaves own
# their sub-preconditioner ("per-split KSP/PC"), including Vanka-within-split
# (the reference's ASM-within-split, FieldSplitTree.hpp:61).
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FieldSplitNode:
    """One node of the recursive split tree.

    Leaf: ``vars`` lists unknown names; ``pc`` picks the sub-preconditioner
    ("jacobi" | "cg" | "vanka"), ``iters`` its sweep/iteration count.
    Inner: ``children`` + ``combine`` in {"additive", "multiplicative",
    "schur"}; a Schur node has exactly two children (field, constraint) with
    ``schur_fact`` in {"diag","lower","upper","full"} and the Schur solve
    approximated by ``schur_iters`` CG iterations on S = C - B diag(F)^-1 B'
    (SetSchurFactorizationType / SetSchurPreType semantics).
    """

    name: str
    vars: Optional[Sequence[str]] = None
    children: Optional[Sequence["FieldSplitNode"]] = None
    combine: str = "additive"
    pc: str = "jacobi"
    iters: int = 4
    schur_fact: str = "full"
    schur_iters: int = 10
    vanka_block_elems: int = 2

    def leaf_vars(self) -> List[str]:
        if self.vars is not None:
            return list(self.vars)
        out: List[str] = []
        for c in self.children:
            out.extend(c.leaf_vars())
        return out


def _node_idx(node: FieldSplitNode, assembler) -> np.ndarray:
    parts = []
    for v in node.leaf_vars():
        off = assembler.offsets[v]
        nd = assembler.dofmaps[v].n_dofs
        parts.append(np.arange(off, off + nd))
    return np.concatenate(parts)


def build_fieldsplit_tree(A: SparseOp, assembler, node: FieldSplitNode,
                          dirichlet_mask=None) -> Callable:
    """Recursive preconditioner M(r) -> z over the full stacked vector.

    ``assembler`` supplies the KKoffset layout (offsets/dofmaps); pass the
    fine-level Assembler, or any object with compatible ``offsets`` /
    ``dofmaps`` attributes for PtAP-coarsened levels.  Dirichlet rows are
    identity in A, so sub-solves leave them consistent."""
    n = A.n_rows

    def make(nd: FieldSplitNode) -> Callable:
        idx = jnp.asarray(_node_idx(nd, assembler))
        if nd.vars is not None:                       # leaf
            if nd.pc == "vanka":
                from .vanka import build_element_blocks
                blocks = build_element_blocks(
                    assembler, nd.vanka_block_elems,
                    dof_filter=np.isin(
                        np.arange(assembler.n_dofs_pad),
                        _node_idx(nd, assembler)))
                from .vanka import vanka_smoother
                sm = vanka_smoother(A, blocks, omega=1.0, iters=nd.iters)

                def M_vanka(r):
                    rg = jnp.zeros(n, r.dtype).at[idx].set(r)
                    return sm(rg, jnp.zeros(n, r.dtype))[idx]

                return M_vanka
            Fop = sub_operator(A, idx, n)
            d = A.diagonal()[idx]
            dsafe = jnp.where(jnp.abs(d) < 1e-30, 1.0, d)
            if nd.pc == "cg":
                def M_cg(r):
                    z, _ = cg(Fop, r, M=lambda rr: rr / dsafe, tol=1e-2,
                              maxiter=nd.iters)
                    return z
                return M_cg

            def M_jac(r):
                return richardson(Fop, r, M=lambda rr: rr / dsafe,
                                  iters=nd.iters)
            return M_jac

        child_Ms = [make(c) for c in nd.children]
        child_idx = [jnp.asarray(_node_idx(c, assembler)) for c in nd.children]

        if nd.combine == "schur":
            assert len(nd.children) == 2, "Schur node needs 2 children"
            iu, ip = child_idx
            Mu, Mp_inner = child_Ms
            F = sub_operator(A, iu, n)
            Bt = coupling_operator(A, iu, ip, n)
            B = coupling_operator(A, ip, iu, n)
            C = sub_operator(A, ip, n)
            dF = A.diagonal()[iu]
            dFs = jnp.where(jnp.abs(dF) < 1e-30, 1.0, dF)

            def S_neg(xp):
                return B(Bt(xp) / dFs) - C(xp)

            def solve_S(rp):
                z, _ = cg(S_neg, -rp, M=Mp_inner, tol=1e-2,
                          maxiter=nd.schur_iters)
                return z

            pu, pp = _pos(idx, iu), _pos(idx, ip)

            def M_schur(r):
                ru, rp = r[pu], r[pp]
                if nd.schur_fact == "diag":
                    zu, zp = Mu(ru), solve_S(rp)
                elif nd.schur_fact == "lower":
                    zu = Mu(ru)
                    zp = solve_S(rp - B(zu))
                elif nd.schur_fact == "upper":
                    zp = solve_S(rp)
                    zu = Mu(ru - Bt(zp))
                else:
                    zu0 = Mu(ru)
                    zp = solve_S(rp - B(zu0))
                    zu = zu0 - Mu(Bt(zp))
                out = jnp.zeros(idx.shape[0], r.dtype)
                return out.at[pu].set(zu).at[pp].set(zp)

            return M_schur

        if nd.combine == "multiplicative":
            def M_mult(r):
                zg = jnp.zeros(n, r.dtype)
                rg = jnp.zeros(n, r.dtype).at[idx].set(r)
                for ci, cm in zip(child_idx, child_Ms):
                    rr = (rg - A @ zg)[ci]
                    zg = zg.at[ci].add(cm(rr))
                return zg[idx]
            return M_mult

        def M_add(r):
            rg = jnp.zeros(n, r.dtype).at[idx].set(r)
            zg = jnp.zeros(n, r.dtype)
            for ci, cm in zip(child_idx, child_Ms):
                zg = zg.at[ci].set(cm(rg[ci]))
            return zg[idx]
        return M_add

    root_idx = jnp.asarray(_node_idx(node, assembler))
    M_root = make(node)

    def M(r):
        z = jnp.zeros_like(r)
        return z.at[root_idx].set(M_root(r[root_idx]))

    return M


def _pos(parent_idx, child_idx):
    """Static positions of child dofs within the parent's index array."""
    p = np.asarray(parent_idx)
    c = np.asarray(child_idx)
    lut = np.full(int(p.max()) + 1, -1, np.int64)
    lut[p] = np.arange(len(p))
    pos = lut[c]
    assert (pos >= 0).all(), "child split not contained in parent"
    return jnp.asarray(pos)


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
