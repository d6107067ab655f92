"""Inter-level transfer operators and Galerkin coarsening.

- Prolongation P (coarse -> fine) per FE family, built element-wise from the
  refinement embedding (reference fe_prolongation_matrices.hpp:22-48,
  LinearImplicitSystem::BuildProlongatorMatrix, .cpp:238).
- Galerkin triple product A_c = P^T A_f P (reference matrix_PtAP,
  SparseMatrix.hpp:183, PETSc MatPtAP) re-designed for TPU as a *precomputed
  linear schedule*: with both patterns static, every coarse nnz is a fixed
  linear combination of fine nnz values, so the device-side PtAP is one
  gather + multiply + segment-sum — no SpGEMM needed at run time
  (SURVEY.md §7 hard part 1).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..mesh.refine import local_prolongation
from .sparse import EllPattern, SparseOp, op_from_scipy, pattern_from_pairs


def prolongation_scipy(coarse_mesh, fine_mesh, family: str) -> sp.csr_matrix:
    """(n_fine_dofs, n_coarse_dofs) interpolation matrix for one family."""
    assert fine_mesh.parent_elem is not None, "fine mesh lacks refinement lineage"
    blocks = local_prolongation(fine_mesh.geom, family)   # (nk, ndf, ndc)
    dmf = fine_mesh.dofmap(family)
    dmc = coarse_mesh.dofmap(family)
    ndf, ndc = blocks.shape[1], blocks.shape[2]
    ne = fine_mesh.n_elems
    rows = np.repeat(dmf.conn, ndc, axis=1).ravel()
    cols = np.tile(dmc.conn[fine_mesh.parent_elem], (1, ndf)).ravel()
    # AMR meshes copy unrefined elements verbatim (child_slot = -1,
    # mesh/amr.py refine_selective): their block is the identity — the
    # content of the reference's _PPamr (LinearImplicitSystem.cpp:529-577)
    slots = np.asarray(fine_mesh.child_slot)
    if (slots < 0).any():
        assert ndf == ndc
        blocks = np.concatenate([blocks, np.eye(ndf)[None]], axis=0)
        slots = np.where(slots < 0, blocks.shape[0] - 1, slots)
    vals = blocks[slots].transpose(0, 1, 2).ravel()
    # conforming interpolation: duplicated (row, col) pairs agree — keep first
    keys = rows.astype(np.int64) * dmc.n_dofs + cols
    _, first = np.unique(keys, return_index=True)
    rows, cols, vals = rows[first], cols[first], vals[first]
    keep = np.abs(vals) > 1e-14
    P = sp.csr_matrix((vals[keep], (rows[keep], cols[keep])),
                      shape=(dmf.n_dofs, dmc.n_dofs))
    P.sum_duplicates()
    P.sort_indices()
    return P


def block_diag_prolongation(coarse_mesh, fine_mesh, unknowns) -> sp.csr_matrix:
    """Stacked-block prolongation over a system's unknowns (KKoffset layout)."""
    mats = [prolongation_scipy(coarse_mesh, fine_mesh, u.family) for u in unknowns]
    return sp.block_diag(mats, format="csr")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PtAPSchedule:
    """Device-side Galerkin product: coarse_data = segsum(coeff * fine_data[src]).

    Registered as a pytree so schedules pass through ``jit`` as ARGUMENTS
    (src/dst reach tens of millions of entries on fine levels; baked-in
    constants of that size stall XLA constant folding for minutes)."""

    coarse_pattern: EllPattern
    src: jnp.ndarray       # (n_triplets,) flat index into fine ELL data
    dst: jnp.ndarray       # (n_triplets,) flat index into coarse ELL data (sorted)
    coeff: jnp.ndarray     # (n_triplets,)
    # device copies of the coarse pattern's cols/valid (leaves, NOT baked
    # constants: fine-level coarse patterns reach ~10M entries)
    coarse_cols: Optional[jnp.ndarray] = None
    coarse_valid: Optional[jnp.ndarray] = None
    # (n_out + 1,) triplet range per coarse slot (dst is sorted, so the
    # boundaries are STATIC): in f64 the apply reduces with one cumsum +
    # boundary differences instead of segment_sum — 5x faster on TPU (the
    # scatter path costs ~7.6 ms vs 1.4 ms on the nsbenc L2 schedule).
    # f32 MUST NOT take the cumsum path: differencing a global prefix whose
    # magnitude is ~1e6x a segment's sum wipes the segment entirely —
    # measured on the FSI _RR schedule, 1922 coarse rows became EXACTLY
    # zero and the coarse LU went singular (r5); apply() routes f32
    # through the sorted segment_sum instead
    ends: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return ((self.src, self.dst, self.coeff, self.coarse_cols,
                 self.coarse_valid, self.ends), (self.coarse_pattern,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], *children)

    def apply(self, fine_data: jnp.ndarray) -> jnp.ndarray:
        """fine ELL data (nr, w) -> coarse ELL data (nrc, wc)."""
        contrib = self.coeff * fine_data.ravel()[self.src]
        nrc, wc = self.coarse_pattern.n_rows, self.coarse_pattern.width
        if self.ends is not None and contrib.dtype == jnp.float64:
            cs = jnp.concatenate([jnp.zeros(1, contrib.dtype),
                                  jnp.cumsum(contrib)])
            out = cs[self.ends[1:]] - cs[self.ends[:-1]]
        else:
            # f32 (TPU solves): per-segment sums only — see `ends` note
            out = jax.ops.segment_sum(contrib, self.dst,
                                      num_segments=nrc * wc,
                                      indices_are_sorted=True)
        return out.reshape(nrc, wc)


def build_ptap_schedule(fine_pattern: EllPattern, P: sp.csr_matrix,
                        dtype=np.float64,
                        R: Optional[sp.spmatrix] = None) -> PtAPSchedule:
    """Precompute the triple-product linear schedule for static patterns.

    Default (R=None, Galerkin): A_c[i, j] = sum_{k,l} P[k, i] A[k, l] P[l, j]
    — for every fine nnz (k, l) and every (i in P-row k, j in P-row l) emit
    a triplet (dst=slot_c(i,j), src=slot_f(k,l), coeff=P[k,i] * P[l,j]).

    With an explicit R (nc x nf), the general non-symmetric product
    A_c = R A P (reference ``SparseMatrix::matrix_ABC``,
    SparseMatrix.hpp:186, used for the FSI _RR restriction pairing,
    MonolithicFSINonLinearImplicitSystem.hpp:83-101): the left factor draws
    i from R-column k with coefficient R[i, k] instead of P[k, i].
    """
    # fine nnz list in ELL slot order
    counts_f = np.diff(fine_pattern.indptr)
    k_of = np.repeat(np.arange(fine_pattern.n_rows), counts_f)
    l_of = fine_pattern.indices
    slot_f = fine_pattern.csr_to_ell_slots()
    # coarse pattern from symbolic PtAP
    ones = sp.csr_matrix((np.ones_like(slot_f, dtype=np.float64),
                          fine_pattern.indices.astype(np.int64),
                          fine_pattern.indptr),
                         shape=(fine_pattern.n_rows, fine_pattern.n_cols))
    Pc = P.tocsr()
    # left factor rows indexed by fine row k: Galerkin uses P itself
    # (i, coeff) = (P-row k), the general ABC product uses R^T-row k
    Lc = Pc if R is None else R.T.tocsr()
    # symbolic product with |P|: signed entries (disc_linear frame-change
    # blocks) can cancel exactly and punch holes in the coarse pattern
    Pabs = Pc.copy()
    Pabs.data = np.abs(Pabs.data)
    Labs = Lc.copy()
    Labs.data = np.abs(Labs.data)
    C = (Labs.T @ ones @ Pabs).tocsr()
    C.sort_indices()
    coo = C.tocoo()
    # always include the diagonal so Dirichlet identity rows exist on coarse
    # levels even when P has been masked at essential dofs
    dg = np.arange(C.shape[0])
    cpat = pattern_from_pairs(np.concatenate([coo.row, dg]),
                              np.concatenate([coo.col, dg]),
                              C.shape[0], C.shape[1])
    from ..assembly.engine import _build_slot_lut
    lut_c = _build_slot_lut(cpat)
    # expand triplets (vectorized, batched over fine nnz to bound memory);
    # left factor rows come from Lc (= P for Galerkin, R^T for the general
    # non-symmetric R A P product)
    Pptr, Pidx, Pval = Pc.indptr, Pc.indices, Pc.data
    Lptr, Lidx, Lval = Lc.indptr, Lc.indices, Lc.data
    src_all, dst_all, coeff_all = [], [], []
    B = 1 << 20
    for s0 in range(0, len(slot_f), B):
        kk = k_of[s0:s0 + B]
        ll = l_of[s0:s0 + B]
        ss = slot_f[s0:s0 + B]
        nk = Lptr[kk + 1] - Lptr[kk]
        nl = Pptr[ll + 1] - Pptr[ll]
        reps = nk * nl
        if reps.sum() == 0:
            continue
        # expand each fine nnz into nk*nl triplets
        ent = np.repeat(np.arange(len(kk)), reps)
        # position within the (nk x nl) product (vectorized ranges:
        # arange(total) minus each entry's cumulative start)
        starts = np.zeros(len(reps), np.int64)
        np.cumsum(reps[:-1], out=starts[1:])
        offs = np.arange(int(reps.sum()), dtype=np.int64) - starts[ent]
        a = offs // nl[ent]
        b = offs % nl[ent]
        pi = Lidx[Lptr[kk[ent]] + a]
        pj = Pidx[Pptr[ll[ent]] + b]
        cv = Lval[Lptr[kk[ent]] + a] * Pval[Pptr[ll[ent]] + b]
        src_all.append(ss[ent])
        dst_all.append(lut_c(pi, pj))
        coeff_all.append(cv)
    src = np.concatenate(src_all)
    dst = np.concatenate(dst_all)
    coeff = np.concatenate(coeff_all)
    keep = np.abs(coeff) > 0
    src, dst, coeff = src[keep], dst[keep], coeff[keep]
    order = np.argsort(dst, kind="stable")
    # int32 indices when ranges allow: halves transfer size and avoids
    # compile-time s64->s32 converts of multi-M-entry arrays
    src, dst = src[order], dst[order]
    if src.size == 0 or src.max() < 2 ** 31:
        src = src.astype(np.int32)
    if dst.size == 0 or dst.max() < 2 ** 31:
        dst = dst.astype(np.int32)
    n_out = cpat.n_rows * cpat.width
    ends = np.searchsorted(dst, np.arange(n_out + 1)).astype(
        np.int32 if len(dst) < 2 ** 31 else np.int64)
    return PtAPSchedule(cpat,
                        jnp.asarray(src),
                        jnp.asarray(dst),
                        jnp.asarray(coeff[order].astype(dtype)),
                        jnp.asarray(cpat.cols),
                        jnp.asarray(cpat.valid),
                        jnp.asarray(ends))


def fsi_restriction_transpose(coarse_mesh, fine_mesh, unknowns,
                              pairs: Dict[str, str],
                              solid_groups: Sequence[int],
                              mark_family: str = "biquadratic"
                              ) -> sp.csr_matrix:
    """Petrov-Galerkin restriction transpose R^T for monolithic FSI.

    Reference: ``MonolithicFSINonLinearImplicitSystem::
    Build_RestrictionTranspose_OneElement_OneFEFamily_With_Pair_In_System``
    (MonolithicFSINonLinearImplicitSystem.cpp:46-140) invoked from the FSI
    ``BuildProlongatorMatrix`` override (:147-246): the restriction is built
    like the prolongation, except entries that CROSS the fluid/solid
    interface — fine node solid-mark != coarse node solid-mark — are routed
    into the column block of the variable's *pair* (``PairSolution("U","DX")``
    in the FSI apps) with the same interpolation weight, or dropped when the
    variable is its own pair.  Coarse operators then use the non-symmetric
    triple product ``A_c = R A P`` (matrix_ABC, LinearImplicitSystem.cpp:
    348-352) and the MG cycle restricts residuals with R instead of P^T.

    Semantics reproduced exactly:
    - node solid mark = 1 iff the node touches a solid element
      (Mesh::Topology_FillSolidNodeFlag, Mesh.cpp:478-501);
    - a FINE dof is solid iff its interpolated coarse mark is ~1
      (``0.99 < sum_j P[i,j] m_j < 1.01``, .cpp:100 — partition of unity
      makes this exact when every contributing coarse node is solid);
    - only the ``mark_family`` (CONTINUOUS_BIQUADRATIC) carries marks: for
      other families the reference's coarse marks stay false, reducing to
      plain prolongation (.cpp:70 ``soltype_in == 2`` guard); pressure
      variables always use plain prolongation (:227 testIfPressure).

    Returns R^T (n_fine x n_coarse, block layout of ``unknowns``);
    ``R = (R^T)^T``.
    """
    def node_marks(mesh):
        mark = np.zeros(mesh.coords.shape[0], bool)
        sel = np.isin(np.asarray(mesh.elem_group), list(solid_groups))
        if sel.any():
            mark[np.unique(np.asarray(mesh.conn)[sel].ravel())] = True
        return mark

    mc_node = node_marks(coarse_mesh)
    P_fam: Dict[str, sp.csr_matrix] = {}
    row_off = np.cumsum([0] + [fine_mesh.dofmap(u.family).n_dofs
                               for u in unknowns])
    col_off = np.cumsum([0] + [coarse_mesh.dofmap(u.family).n_dofs
                               for u in unknowns])
    col_block = {u.name: i for i, u in enumerate(unknowns)}
    rows_all, cols_all, vals_all = [], [], []
    for k, u in enumerate(unknowns):
        if u.family not in P_fam:
            P_fam[u.family] = prolongation_scipy(coarse_mesh, fine_mesh,
                                                 u.family)
        Pk = P_fam[u.family].tocoo()
        pair = pairs.get(u.name, u.name)
        if u.family != mark_family:
            # non-biquadratic (incl. pressure): plain prolongation block —
            # the reference's marks stay false for soltype != 2, and
            # pressure is explicitly excluded (testIfPressure, .cpp:227)
            rows_all.append(Pk.row + row_off[k])
            cols_all.append(Pk.col + col_off[k])
            vals_all.append(Pk.data)
            continue
        dmc = coarse_mesh.dofmap(u.family)
        m_c = mc_node[dmc.nodes].astype(np.float64)
        v_f = np.asarray(P_fam[u.family] @ m_c)
        isolid_f = np.abs(v_f - 1.0) < 0.01
        route = isolid_f[Pk.row] != (m_c[Pk.col] > 0.5)
        # same-side entries stay in this variable's column block
        rows_all.append(Pk.row[~route] + row_off[k])
        cols_all.append(Pk.col[~route] + col_off[k])
        vals_all.append(Pk.data[~route])
        if pair != u.name:
            # interface-crossing entries go to the PAIR's column block
            kp = col_block[pair]
            rows_all.append(Pk.row[route] + row_off[k])
            cols_all.append(Pk.col[route] + col_off[kp])
            vals_all.append(Pk.data[route])
        # pair == self (DX/DY): crossing entries are zeroed (.cpp:117)
    RRt = sp.csr_matrix((np.concatenate(vals_all),
                         (np.concatenate(rows_all),
                          np.concatenate(cols_all))),
                        shape=(int(row_off[-1]), int(col_off[-1])))
    RRt.sum_duplicates()
    RRt.sort_indices()
    return RRt


def mask_prolongation(P: sp.spmatrix, row_mask, col_mask) -> sp.csr_matrix:
    """Zero the masked (essential/Dirichlet) rows and columns of a transfer
    operator.  CSR diagonal scaling — the LIL fancy-assignment form is
    minutes-slow at fine-level sizes (hundreds of k rows)."""
    dr = sp.diags((~np.asarray(row_mask[:P.shape[0]])).astype(np.float64))
    dc = sp.diags((~np.asarray(col_mask[:P.shape[1]])).astype(np.float64))
    Pm = (dr @ P @ dc).tocsr()
    Pm.eliminate_zeros()
    return Pm


def op_pair_from_scipy(P: sp.csr_matrix, dtype=None,
                       R: Optional[sp.spmatrix] = None
                       ) -> Tuple[SparseOp, SparseOp]:
    """(P, R) as device ELL operators; R defaults to P^T (Galerkin), or an
    explicit Petrov-Galerkin restriction (FSI _RR)."""
    dt = np.float64 if dtype is None else dtype
    Pop, _ = op_from_scipy(P.astype(dt))
    Rm = P.T.tocsr() if R is None else R.tocsr()
    Rop, _ = op_from_scipy(Rm.astype(dt))
    return Pop, Rop
