"""Batched block (Vanka / ASM-style) smoothers.

The reference smooths coupled saddle-point systems with PCASM subdomain
blocks built by MeshASMPartitioning (LinearEquationSolverPetscAsm.cpp:283-292,
MeshASMPartitioning.hpp:37: groups of elements per block, Schur-variable
handling).  On TPU the equivalent is a *batched dense* block solve: all block
matrices are extracted from the ELL operator with one precomputed gather and
factorized/solved together on the MXU (SURVEY.md §2.4 "batched small dense
block solves over blocks-within-shard").

Additive overlapping Schwarz step:  x += omega * sum_b R_b^T A_bb^{-1} R_b r
with per-dof overlap scaling.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..assembly.engine import Assembler, _build_slot_lut
from .sparse import EllPattern, SparseOp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class VankaBlocks:
    """Block structure, pre-split by color at build time and registered as a
    pytree so the (multi-M-entry) dof/slot index arrays pass through ``jit``
    as ARGUMENTS rather than baked constants (compile-time constant folding
    over them is minutes-slow on fine levels).

    color_dofs[c]: (nb_c, bs) block dof ids, padded with n (dummy);
    color_slots[c]: (nb_c, bs, bs) flat ELL index (oob -> miss sentinel);
    blocks of one color touch disjoint dofs (greedy coloring)."""

    color_dofs: Tuple        # per color (nb_c, bs)
    color_slots: Tuple       # per color (nb_c, bs, bs)
    scale: np.ndarray        # (n,) 1/overlap count (additive sweep)
    n: int

    def tree_flatten(self):
        return (self.color_dofs, self.color_slots, self.scale), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])

    def pad_dof(self) -> int:
        return self.n

    @property
    def n_colors(self) -> int:
        return len(self.color_dofs)


def _color_blocks(blocks: Sequence[np.ndarray], n: int) -> np.ndarray:
    """Greedy coloring so blocks of one color touch disjoint dofs."""
    colors = np.zeros(len(blocks), np.int32)
    used: list = []
    for i, b in enumerate(blocks):
        c = 0
        while True:
            if c == len(used):
                used.append(np.zeros(n, bool))
            if not used[c][b].any():
                used[c][b] = True
                colors[i] = c
                break
            c += 1
    return colors


def build_element_blocks(assembler: Assembler, elems_per_block: int = 4,
                         include_pressure: bool = True,
                         pattern: Optional[EllPattern] = None,
                         dof_filter: Optional[np.ndarray] = None,
                         groups: Optional[Sequence[int]] = None) -> VankaBlocks:
    """Blocks = dof patches of ``elems_per_block`` consecutive elements
    (reference SetElementBlockNumber semantics, mesh-partition order).

    pattern: ELL pattern the target operator uses (defaults to the
    assembler's own; pass the PtAP coarse pattern when smoothing a
    Galerkin-coarsened operator).
    dof_filter: boolean mask (n_dofs_pad,) restricting blocks to a dof
    subset (Vanka-within-split, reference ASM-within-split).
    groups: ``None`` = one sweep over all elements; ``"material"`` = blocks
    never span two element groups (material-split ASM blocks for FSI,
    reference MeshASMPartitioning.hpp:37-50 block_type_range — fluid and
    solid patches are factored and swept separately); a sequence of group
    ids = restrict blocks to those groups only."""
    edofs_all = assembler.edofs[:assembler.mesh.n_elems]
    eg = np.asarray(getattr(assembler.mesh, "elem_group",
                            np.zeros(assembler.mesh.n_elems, np.int32)))
    if groups is None:
        chunks = [edofs_all]
    elif isinstance(groups, str) and groups == "material":
        chunks = [edofs_all[eg == g] for g in np.unique(eg)]
    else:
        chunks = [edofs_all[np.isin(eg, list(groups))]]
    n = assembler.n_dofs_pad
    blocks = []
    for edofs in chunks:
        nb_c = -(-len(edofs) // elems_per_block)
        for b in range(nb_c):
            sel = edofs[b * elems_per_block:(b + 1) * elems_per_block]
            d = np.unique(sel)
            d = d[(d >= 0) & (d < n)]
            # drop Dirichlet rows from blocks (their rows are identity)
            d = d[~assembler.dirichlet_mask[d]]
            if dof_filter is not None:
                d = d[dof_filter[d]]
            if len(d):
                blocks.append(d)
    assert blocks, "no non-empty Vanka blocks (filter too restrictive?)"
    nb = len(blocks)
    bs = max(len(b) for b in blocks)
    dofs = np.full((nb, bs), n, np.int64)
    for i, b in enumerate(blocks):
        dofs[i, :len(b)] = b
    # overlap counts
    cnt = np.zeros(n + 1)
    np.add.at(cnt, dofs.ravel(), 1.0)
    scale = np.where(cnt[:n] > 0, 1.0 / np.maximum(cnt[:n], 1.0), 0.0)
    # slots for block matrices
    pat = pattern if pattern is not None else assembler.pattern
    lut = lut_with_miss(pat)
    bi = np.repeat(dofs, bs, axis=1).reshape(nb, bs, bs)
    bj = np.tile(dofs, (1, bs)).reshape(nb, bs, bs)
    slots = lut(bi.ravel(), bj.ravel()).reshape(nb, bs, bs)
    colors = _color_blocks(blocks, n)
    idt = np.int32 if n < 2 ** 31 else np.int64
    st = np.int32 if pat.n_rows * pat.width < 2 ** 31 else np.int64
    cd, cs = [], []
    for c in range(int(colors.max()) + 1):
        sel = colors == c
        cd.append(jnp.asarray(dofs[sel].astype(idt)))
        cs.append(jnp.asarray(slots[sel].astype(st)))
    return VankaBlocks(tuple(cd), tuple(cs), scale, n)


def lut_with_miss(pattern: EllPattern):
    """(rows, cols) -> flat ELL slot, with misses/out-of-range -> oob index."""
    counts = np.diff(pattern.indptr)
    csr_rows = np.repeat(np.arange(pattern.n_rows, dtype=np.int64), counts)
    csr_keys = csr_rows * pattern.n_cols + pattern.indices
    ell_slots = pattern.csr_to_ell_slots()
    oob = pattern.n_rows * pattern.width

    def lut(rows, cols):
        in_range = (rows < pattern.n_rows) & (cols < pattern.n_cols)
        keys = rows.astype(np.int64) * pattern.n_cols + cols.astype(np.int64)
        pos = np.searchsorted(csr_keys, np.where(in_range, keys, 0))
        pos = np.minimum(pos, len(csr_keys) - 1)
        hit = in_range & (csr_keys[pos] == keys)
        return np.where(hit, ell_slots[pos], oob)

    return lut


def _factor_blocks(A: SparseOp, dofs, slots, n):
    flat = jnp.concatenate([A.data.ravel(), jnp.zeros(1, A.data.dtype)])
    Ab = flat[slots]                                   # (nb, bs, bs)
    rows_valid = dofs < n                              # (nb, bs)
    bs = dofs.shape[1]
    eye = jnp.eye(bs, dtype=A.data.dtype)
    Ab = jnp.where(rows_valid[:, :, None] & rows_valid[:, None, :], Ab, 0.0)
    Ab = Ab + jnp.where(rows_valid, 0.0, 1.0)[:, :, None] * eye[None]
    return jax.scipy.linalg.lu_factor(Ab), rows_valid


def _invert_blocks(A: SparseOp, dofs, slots, n):
    """Explicit batched block inverses.  LU triangular SOLVES are
    sequential scalar-ish code on TPU and run once per smoother
    application (per color, per cycle, per Krylov iteration); an explicit
    inverse costs one extra batched solve at operator-build time and turns
    every application into a batched (nb, bs, bs) x (nb, bs) MXU matmul.
    Blocks are small element patches (bs ~ 30-150), where the inverse's
    extra rounding is far below smoother accuracy requirements."""
    (lu, piv), rows_valid = _factor_blocks(A, dofs, slots, n)
    bs = dofs.shape[1]
    eye = jnp.broadcast_to(jnp.eye(bs, dtype=lu.dtype),
                           (lu.shape[0], bs, bs))
    Ainv = jax.scipy.linalg.lu_solve((lu, piv), eye)
    return Ainv, rows_valid


def vanka_smoother(A: SparseOp, blocks: VankaBlocks, omega: float = 1.0,
                   iters: int = 1, multiplicative: bool = True):
    """smooth(b, x) -> x.

    multiplicative=True (default): colored sweeps — blocks of one color touch
    disjoint dofs, so each color is one batched dense solve and colors apply
    Gauss-Seidel-style (residual refreshed between colors).  Damping
    omega=1.0 is stable.  multiplicative=False: single additive sweep with
    overlap averaging (needs omega ~0.5).
    """
    n = blocks.n

    if multiplicative:
        per_color = []
        for d, s in zip(blocks.color_dofs, blocks.color_slots):
            Ainv, rows_valid = _invert_blocks(A, d, s, n)
            per_color.append((d, Ainv, rows_valid))

        def smooth(b, x):
            def body(x, _):
                for d, Ainv, rows_valid in per_color:
                    r = b - A @ x
                    rpad = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
                    rb = rpad[d] * rows_valid
                    delta = jnp.einsum("bij,bj->bi", Ainv, rb)
                    upd = jnp.zeros(n + 1, x.dtype).at[d.ravel()].add(
                        (delta * rows_valid).ravel())
                    x = x + omega * upd[:n]
                return x, None

            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x

        return smooth

    dofs = jnp.concatenate(blocks.color_dofs)
    slots = jnp.concatenate(blocks.color_slots)
    scale = jnp.asarray(blocks.scale)
    Ainv, rows_valid = _invert_blocks(A, dofs, slots, n)

    def smooth(b, x):
        def body(x, _):
            r = b - A @ x
            rpad = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
            rb = rpad[dofs] * rows_valid                # (nb, bs)
            delta = jnp.einsum("bij,bj->bi", Ainv, rb)
            upd = jnp.zeros(n + 1, x.dtype).at[dofs.ravel()].add(
                (delta * rows_valid).ravel())
            return x + omega * scale * upd[:n], None

        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x

    return smooth
