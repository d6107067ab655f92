"""Device sparse operators (static pattern, ELL layout).

The reference delegates all distributed sparse algebra to PETSc
(SparseMatrix.hpp:48, PetscMatrix).  The TPU-native design freezes the
sparsity pattern at setup on host (FEM patterns are static — SURVEY.md §7
"Static everything") and keeps only a dense, padded value array on device:

- ELL layout: ``cols (n_rows, w)`` int32 and ``data (n_rows, w)``; padding
  entries point at the row's own diagonal with value 0, so SpMV needs no
  masking and the gather is always in-bounds.
- SpMV = ``(data * x[cols]).sum(-1)`` — a gather + elementwise product +
  small-axis reduction.  On TPU the per-element gather lowers to scalar
  loads, so this baseline path is memory-system-bound far below roofline;
  it remains the reference semantics and the CPU/test path.  The fast
  paths re-lay the same assembled data: diagonal-banded operators
  (dia.py), lattice stencils (stencil.py), patch-lattice stencils
  (patchstencil.py), and blocked-ELL slabs for general unstructured
  operators (bell.py, ~72x this path on the nsbenc NS Jacobian).
- Assembly scatters batched element matrices into ``data`` through a
  precomputed slot map (see assembly/engine.py) — the analogue of
  ``add_matrix_blocked`` + ``close()`` (SparseMatrix.hpp:165) without any
  dynamic off-process caching.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass(frozen=True, eq=False)
class EllPattern:
    """Host-side immutable sparsity pattern with CSR<->ELL correspondence.

    eq=False: identity hash/equality so a pattern can serve as static pytree
    aux data (e.g. PtAPSchedule.coarse_pattern) in jitted signatures."""

    n_rows: int
    n_cols: int
    width: int
    cols: np.ndarray          # (n_rows, width) int32, padded with row-diag col
    valid: np.ndarray         # (n_rows, width) bool
    indptr: np.ndarray        # CSR indptr (n_rows+1,)
    indices: np.ndarray       # CSR indices (nnz,)

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    def csr_to_ell_slots(self) -> np.ndarray:
        """(nnz,) flat index into data.ravel() for each CSR entry, in CSR order."""
        counts = np.diff(self.indptr)
        rows = np.repeat(np.arange(self.n_rows), counts)
        k = np.arange(self.nnz) - np.repeat(self.indptr[:-1], counts)
        return (rows * self.width + k).astype(np.int64)


def pattern_from_pairs(rows: np.ndarray, cols: np.ndarray,
                       n_rows: int, n_cols: int) -> EllPattern:
    """Build an ELL pattern from (row, col) index pairs (duplicates merged).

    CSR entry order is (row, sorted col) — ELL slot k of row r is the k-th
    smallest column, making the layout deterministic."""
    m = sp.csr_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                      shape=(n_rows, n_cols))
    m.sum_duplicates()
    m.sort_indices()
    counts = np.diff(m.indptr)
    w = int(counts.max()) if n_rows else 0
    ell_cols = np.repeat(np.minimum(np.arange(n_rows), n_cols - 1)[:, None], w, axis=1)
    valid = np.zeros((n_rows, w), bool)
    for_r = np.repeat(np.arange(n_rows), counts)
    k = np.arange(m.nnz) - np.repeat(m.indptr[:-1], counts)
    ell_cols[for_r, k] = m.indices
    valid[for_r, k] = True
    return EllPattern(n_rows, n_cols, w, ell_cols.astype(np.int32), valid,
                      m.indptr.copy(), m.indices.astype(np.int64))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseOp:
    """Device sparse matrix: static ELL pattern + value leaf.

    The pattern (cols) is traced as a constant-shaped leaf; jit-compatible.
    """

    data: jnp.ndarray       # (n_rows, width)
    cols: jnp.ndarray       # (n_rows, width) int32
    n_cols: int

    def tree_flatten(self):
        return (self.data, self.cols), (self.n_cols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, cols = children
        return cls(data, cols, aux[0])

    @property
    def n_rows(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1]

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return (self.data * x[self.cols]).sum(axis=-1)

    def __matmul__(self, x):
        return self.matvec(x)

    def rmatvec(self, y: jnp.ndarray) -> jnp.ndarray:
        """A^T y via scatter-add (deterministic XLA scatter)."""
        contrib = (self.data * y[:, None]).ravel()
        return jnp.zeros(self.n_cols, self.data.dtype).at[self.cols.ravel()].add(contrib)

    def diagonal(self) -> jnp.ndarray:
        rows = jnp.arange(self.n_rows)[:, None]
        mask = self.cols == rows
        return (self.data * mask).sum(axis=-1)

    def to_dense(self) -> jnp.ndarray:
        out = jnp.zeros((self.n_rows, self.n_cols), self.data.dtype)
        rows = jnp.repeat(jnp.arange(self.n_rows), self.width)
        return out.at[rows, self.cols.ravel()].add(self.data.ravel())


def pad_pattern(pat: EllPattern, n_rows_pad: int, n_cols_pad: int) -> EllPattern:
    """Extend a pattern with identity padding rows (row i gets a single valid
    diagonal entry), used to make shapes divisible by a device-mesh axis.
    Padding rows are meant to be flagged Dirichlet so assembly writes 1.0."""
    if n_rows_pad == pat.n_rows and n_cols_pad == pat.n_cols:
        return pat
    extra = n_rows_pad - pat.n_rows
    cols = np.vstack([pat.cols,
                      np.repeat(np.arange(pat.n_rows, n_rows_pad, dtype=np.int32)[:, None],
                                pat.width, axis=1)])
    valid = np.vstack([pat.valid, np.zeros((extra, pat.width), bool)])
    valid[pat.n_rows:, 0] = True
    indptr = np.concatenate([pat.indptr,
                             pat.indptr[-1] + 1 + np.arange(extra)])
    indices = np.concatenate([pat.indices,
                              np.arange(pat.n_rows, n_rows_pad, dtype=np.int64)])
    return EllPattern(n_rows_pad, n_cols_pad, pat.width, cols, valid, indptr, indices)


def op_from_pattern(pat: EllPattern, data: Optional[jnp.ndarray] = None,
                    dtype=jnp.float64) -> SparseOp:
    if data is None:
        data = jnp.zeros((pat.n_rows, pat.width), dtype)
    return SparseOp(data, jnp.asarray(pat.cols), pat.n_cols)


def op_from_scipy(m: sp.spmatrix, dtype=None) -> Tuple[SparseOp, EllPattern]:
    m = m.tocsr()
    m.sort_indices()
    coo = m.tocoo()
    pat = pattern_from_pairs(coo.row, coo.col, m.shape[0], m.shape[1])
    data = np.zeros((pat.n_rows, pat.width), m.dtype if dtype is None else dtype)
    data.ravel()[pat.csr_to_ell_slots()] = m.data
    return SparseOp(jnp.asarray(data), jnp.asarray(pat.cols), pat.n_cols), pat
