"""Blocked-ELL (BELL) sparse operator — the TPU fast path for GENERAL
unstructured operators.

TPUs have no hardware gather: the classic ELL SpMV ``(data * x[cols]).sum``
runs orders of magnitude below the HBM roofline because XLA lowers the
per-element gather to scalar loads (measured ~0.06 Gnnz/s on the nsbenc NS
Jacobian vs a ~100 Gnnz/s roofline).  The structured fast paths (dia.py
lattice diagonals, stencil.py, patchstencil.py) only cover lattice /
refined-patch numberings.  BELL covers everything else:

- Reorder dofs by reverse Cuthill-McKee (host, setup time) so each row's
  neighbors land in a narrow index range (the reference gets locality for
  free from per-rank contiguous dofs, Mesh.hpp:534; here locality is what
  converts sparsity into dense blocks).
- Tile rows into groups of ``T`` (sublane-sized) and columns into 128-lane
  blocks; store only the NONEMPTY (T, 128) tiles as a flat dense slab
  ``blocks (nb, T, 128)`` plus per-block column-block ids.  On FEM
  operators after RCM the slab holds the nnz at ~5-8% density, i.e. HBM
  traffic ~7-9x the pure-ELL bytes — a ~100x win over scalar gathers.
- SpMV: gather x one 128-lane BLOCK at a time (``x2d[block_ids]`` — a row
  gather XLA lowers to efficient per-row DMA, unlike element gathers),
  multiply-reduce each dense tile on the VPU, and combine the per-block
  partial sums with a scatter-free sorted-segment reduction (cumsum +
  boundary difference).

Assembled ELL data re-lays out into the slab with ONE scatter of the n*w
ELL entries per assembly (relayout_*; amortized over the Krylov solve).
The operator quacks like SparseOp for matvec/diagonal so smoothers, MG
cycles, and Krylov consume it unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import EllPattern

# Pallas kernel geometry: blocks per grid step, and the VMEM residency cap
# for the x vector.  Budget at the cap (v5e ~16 MiB VMEM): one-hot routing
# matmul chunk*nxb*4 = 4 MiB, resident x 1 MiB, double-buffered slab chunks
# 2 x 2 MiB, output small -> ~9.5 MiB head-room; 4096 xblocks would put the
# one-hot intermediate alone at 8 MiB and overflow at exactly the largest
# auto-routed sizes
_CHUNK = 512
_PALLAS_MAX_XBLOCKS = 2048


def rcm_permutation(pattern: EllPattern) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the symmetrized pattern graph.

    Returns ``perm`` with new index i <-> old index perm[i].  Works on the
    full stacked multi-variable pattern: RCM interleaves coupled variables
    of nearby nodes automatically, which is exactly what block locality
    needs (no per-variable treatment as in the KKoffset slab layout)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = pattern.n_rows
    a = sp.csr_matrix((np.ones(pattern.nnz, np.int8), pattern.indices,
                       pattern.indptr), shape=(n, pattern.n_cols))
    s = ((a + a.T) > 0).astype(np.int8)
    return np.asarray(reverse_cuthill_mckee(s.tocsr(), symmetric_mode=True),
                      dtype=np.int64)


@dataclasses.dataclass(frozen=True, eq=False)
class BellPlan:
    """Host-side BELL layout (static; identity-hashed as jit aux data)."""

    n: int                    # logical dof count (= pattern.n_rows)
    tile: int                 # rows per block (T)
    n_tiles: int
    n_xblocks: int            # 128-lane blocks covering permuted x
    perm: np.ndarray          # (n,) new -> old dof index
    iperm: np.ndarray         # (n,) old -> new dof index
    block_ids: np.ndarray     # (nb,) column-block id per dense block
    tile_start: np.ndarray    # (n_tiles + 1,) block range per row tile
    dest: np.ndarray          # (n*width,) blocks-flat index per ELL slot
                              #            (out of bounds for padding slots)
    diag_src: np.ndarray      # (n,) blocks-flat index of each row's diagonal
    nb: int                   # logical (nonempty) block count; block_ids is
                              # padded to a _CHUNK multiple

    @property
    def identity(self) -> bool:
        """True when no reordering was applied (skips permute gathers)."""
        return bool(self.perm[0] == 0 and self.perm[-1] == self.n - 1
                    and np.array_equal(self.perm, np.arange(self.n)))

    @property
    def n_blocks(self) -> int:
        """Logical (nonempty) block count."""
        return self.nb

    @property
    def n_blocks_pad(self) -> int:
        return int(self.block_ids.shape[0])

    @property
    def nnz_bytes_ratio(self) -> float:
        """Slab bytes / ideal ELL bytes (value+index) — the traffic price."""
        return (self.n_blocks_pad * self.tile * 128 * 4) / (len(self.dest) * 8)

    def device(self) -> "BellDev":
        """Cached device-array view (see :class:`BellDev`)."""
        dev = getattr(self, "_dev", None)
        if dev is None:
            ident = self.identity
            dev = BellDev(
                jnp.asarray(self.block_ids), jnp.asarray(self.tile_start),
                jnp.asarray(self.dest), jnp.asarray(self.diag_src),
                None if ident else jnp.asarray(self.perm),
                None if ident else jnp.asarray(self.iperm),
                self.n, self.tile, self.n_xblocks, self.n_blocks)
            assert self.n_blocks_pad % _CHUNK == 0
            object.__setattr__(self, "_dev", dev)
        return dev


def ell_block_layout(rp, cp, slots, n_rows: int, n_cols: int, tile: int,
                     n_slots: int, nb_pad: int = None,
                     pad_blocks_to: int = None):
    """Shared blocked-layout core (used by the square BELL plan here and the
    per-shard rectangular halo layout, parallel/halo.build_local_bell).

    rp/cp: (nnz,) row/col indices in the target frame; slots: flat SOURCE
    slot per nnz (ELL or CSR order) within ``n_slots`` total slots —
    non-nnz slots get distinct out-of-bounds destinations (dropped by the
    relayout scatter).  Returns (block_ids, tile_start, dest, nb,
    dest_nnz): block_ids padded to ``nb_pad`` (or the next multiple of
    ``pad_blocks_to``), dest (n_slots,), dest_nnz the slab position per
    nnz entry (for diagonal extraction)."""
    nxb = -(-n_cols // 128)
    n_tiles = -(-n_rows // tile)
    key = (rp // tile) * np.int64(nxb) + cp // 128
    uniq, inv = np.unique(key, return_inverse=True)
    nb = len(uniq)
    if nb_pad is None:
        pad_blocks_to = pad_blocks_to or _CHUNK
        nb_pad = -(-max(nb, 1) // pad_blocks_to) * pad_blocks_to
    assert nb_pad >= nb
    block_ids = np.pad((uniq % nxb).astype(np.int32), (0, nb_pad - nb))
    tile_start = np.searchsorted(uniq // nxb,
                                 np.arange(n_tiles + 1)).astype(np.int32)
    dest_nnz = (inv.astype(np.int64) * tile + rp % tile) * 128 + cp % 128
    dest = nb_pad * tile * 128 + np.arange(n_slots, dtype=np.int64)
    dest[slots] = dest_nnz
    return block_ids, tile_start, dest, nb, dest_nnz


def bell_local_matvec(blocks, block_ids, tile_start, x_ext, n_rows: int,
                      n_cols: int, nb: int):
    """XLA-form blocked matvec core: ``blocks (nbp, T, 128)`` against an
    extended-frame vector ``x_ext (n_cols,)``; the first ``nb`` logical
    blocks participate.  Shared by BellOp.matvec_xla and the per-shard halo
    matvec (parallel/halo.make_halo_spmv_bell).

    Precision note: the scatter-free segment reduction (global cumsum +
    boundary differences) accumulates a running sum across ALL tiles, so in
    float32 with non-cancelling contributions per-row results can lose a
    few digits vs a direct per-row sum.  The solver paths run f64 (or use
    the residual-corrected outer Krylov), where the slack is far below
    discretization error; for standalone f32 use, prefer
    ``jax.ops.segment_sum`` over per-block tile ids if bit-accuracy
    matters more than the ~2x reduction-cost advantage of the cumsum."""
    T = blocks.shape[1]
    nxb = -(-n_cols // 128)
    xp = jnp.zeros(nxb * 128, x_ext.dtype).at[:n_cols].set(x_ext)
    xg = xp.reshape(nxb, 128)[block_ids[:nb]]
    yb = jnp.einsum("btk,bk->bt", blocks[:nb], xg,
                    preferred_element_type=x_ext.dtype)
    # sorted-segment sum over each tile's block run, scatter-free:
    # cumulative sum + difference at the tile boundaries
    cs = jnp.concatenate([jnp.zeros((1, T), yb.dtype),
                          jnp.cumsum(yb, axis=0)], axis=0)
    yt = cs[tile_start[1:]] - cs[tile_start[:-1]]
    return yt.reshape(-1)[:n_rows]


def build_bell_plan(pattern: EllPattern, tile: int = 8,
                    perm=None) -> BellPlan:
    """Blocked-ELL layout of ``pattern``.

    ``perm``: None -> RCM ordering (densest blocks, but the operator then
    pays two n-element permutation gathers per matvec — ~2x slab traffic at
    realistic sizes); "identity" -> no permutation (fastest matvec; block
    density relies on the dof numbering being local, e.g. lattice meshes,
    patch-coherent refinement, or a mesh passed through
    ``mesh.reorder.rcm_reorder``); or an explicit (n,) ordering array."""
    n = pattern.n_rows
    assert pattern.n_cols == n, "BELL expects a square operator"
    if isinstance(perm, str) and perm == "identity":
        perm = np.arange(n, dtype=np.int64)
    elif perm is None:
        perm = rcm_permutation(pattern)
    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(n)

    counts = np.diff(pattern.indptr)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    rp = iperm[rows]
    cp = iperm[pattern.indices]

    n_tiles = -(-n // tile)
    n_xblocks = -(-n // 128)
    # slab layout + relayout destinations (blocks padded to the Pallas
    # kernel chunk so the grid divides with no per-matvec pad copies;
    # padding blocks stay all-zero)
    block_ids, tile_start, dest, nb, dest_csr = ell_block_layout(
        rp, cp, pattern.csr_to_ell_slots(), n, n, tile, n * pattern.width)
    size = (len(block_ids)) * tile * 128
    # diagonal slab positions per (new-order) row; rows without a diagonal
    # pattern entry (e.g. pure padding rows) read a guaranteed-zero hole
    diag_rows_new = rp[cp == rp]
    diag = np.empty(n, np.int64)
    diag[diag_rows_new] = dest_csr[cp == rp]
    if len(diag_rows_new) < n:
        used = np.zeros(size, bool)
        used[dest_csr] = True
        hole = int(np.argmin(used))
        if used[hole]:        # every slab slot occupied: no zero hole exists
            raise RuntimeError("BELL slab fully dense — no zero slot for "
                               "diagonal-less rows (pad blocks exhausted)")
        missing = np.ones(n, bool)
        missing[diag_rows_new] = False
        diag[missing] = hole
    diag = diag[iperm]               # new-row order -> original row order
    return BellPlan(n, tile, n_tiles, n_xblocks, perm, iperm, block_ids,
                    tile_start, dest, diag, nb)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BellDev:
    """Device-side BELL plan arrays (a pytree: pass through jit as an
    ARGUMENT — closed-over plans would bake multi-MB index constants into
    the HLO and stall XLA constant folding, like the transfer schedules in
    systems/system.py)."""

    block_ids: jnp.ndarray     # (nb,) int32
    tile_start: jnp.ndarray    # (n_tiles + 1,) int32
    dest: jnp.ndarray          # (n*width,) int64 relayout destinations
    diag_src: jnp.ndarray      # (n,) int64
    perm: Optional[jnp.ndarray]    # None = identity ordering
    iperm: Optional[jnp.ndarray]
    n: int
    tile: int
    n_xblocks: int
    n_blocks: int              # logical; block_ids/slab are padded to _CHUNK

    @property
    def n_blocks_pad(self) -> int:
        return int(self.block_ids.shape[0])

    def tree_flatten(self):
        return ((self.block_ids, self.tile_start, self.dest, self.diag_src,
                 self.perm, self.iperm),
                (self.n, self.tile, self.n_xblocks, self.n_blocks))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BellOp:
    """Device BELL operator (blocks slab + device plan arrays)."""

    blocks: jnp.ndarray        # (nb, T, 128)
    dev: BellDev

    def tree_flatten(self):
        return (self.blocks, self.dev), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_rows(self) -> int:
        return self.dev.n

    @property
    def n_cols(self) -> int:
        return self.dev.n

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        # auto-route ONLY on TPU: the kernel's pltpu memory spaces do not
        # lower on other backends (GPU etc. fall back to the XLA form)
        if (jax.default_backend() == "tpu"
                and self.dev.n_xblocks <= _PALLAS_MAX_XBLOCKS):
            return spmv_bell_pallas(self, x)
        return self.matvec_xla(x)

    def matvec_xla(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.dev
        xin = x if p.perm is None else x[p.perm]
        y_new = bell_local_matvec(self.blocks, p.block_ids, p.tile_start,
                                  xin, p.n, p.n, p.n_blocks)
        return y_new if p.iperm is None else y_new[p.iperm]

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jnp.ndarray:
        return self.blocks.reshape(-1)[self.dev.diag_src]


def relayout_ell(plan, ell_data: jnp.ndarray) -> BellOp:
    """Scatter assembled ELL data into the BELL slab (one n*w scatter;
    ELL padding slots carry out-of-bounds destinations and are dropped).
    ``plan``: a host :class:`BellPlan` or its :class:`BellDev`."""
    dev = plan.device() if isinstance(plan, BellPlan) else plan
    nbp = dev.n_blocks_pad
    slab = jnp.zeros(nbp * dev.tile * 128, ell_data.dtype)
    slab = slab.at[dev.dest].set(
        ell_data.reshape(-1), mode="drop", unique_indices=True)
    return BellOp(slab.reshape(nbp, dev.tile, 128), dev)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BellBackedOp:
    """ELL operator whose matvec rides the BELL slab.

    Quacks like :class:`~femus_tpu.algebra.sparse.SparseOp` (``data`` /
    ``cols`` / ``diagonal`` / ``rmatvec`` stay ELL — PtAP schedules, Vanka
    block factorizations, and Dirichlet fixups read assembled ELL slots),
    but ``matvec``/``@`` run on the blocked slab: smoothers, MG cycles, and
    Krylov pick up the fast path with no interface change."""

    data: jnp.ndarray       # ELL (n_rows, width)
    cols: jnp.ndarray       # ELL (n_rows, width) int32
    n_cols: int
    bell: BellOp

    def tree_flatten(self):
        return (self.data, self.cols, self.bell), (self.n_cols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], children[2])

    @property
    def n_rows(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1]

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.bell.matvec(x)

    def __matmul__(self, x):
        return self.matvec(x)

    def rmatvec(self, y: jnp.ndarray) -> jnp.ndarray:
        contrib = (self.data * y[:, None]).ravel()
        return jnp.zeros(self.n_cols, self.data.dtype).at[
            self.cols.ravel()].add(contrib)

    def diagonal(self) -> jnp.ndarray:
        return self.bell.diagonal()

    def to_dense(self) -> jnp.ndarray:
        out = jnp.zeros((self.n_rows, self.n_cols), self.data.dtype)
        rows = jnp.repeat(jnp.arange(self.n_rows), self.width)
        return out.at[rows, self.cols.ravel()].add(self.data.ravel())


# ---------------------------------------------------------------------------
# Pallas fused BELL SpMV: one kernel for gather + tile matvecs.
#
# The XLA path issues ~10 kernels per matvec (pad, row-gather, einsum,
# cumsum, boundary diff, slice) whose launch overheads and HBM-materialized
# intermediates (xg, yb) cost more than the slab streaming itself at these
# sizes.  The fused kernel streams the blocks slab through VMEM in chunks,
# keeps the WHOLE x vector resident in VMEM (FEM dof vectors are tiny next
# to the slab), and realizes the x block-gather as a one-hot MXU matmul
# (bids == iota) — the same routing trick as the patch-stencil skeleton.
# Only the cheap sorted-segment reduction (cumsum + boundary diff over
# (nb, T)) stays outside.
# ---------------------------------------------------------------------------

def spmv_bell_pallas(op: BellOp, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x on the BELL slab via the fused Pallas kernel.

    Falls back to the XLA path when x is too large to sit in VMEM
    (n_xblocks > _PALLAS_MAX_XBLOCKS) — the launch overheads amortize away
    at that scale anyway.  The slab arrives pre-padded to a _CHUNK multiple
    (build_bell_plan), so the grid divides with no per-call copies."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = op.dev
    if p.n_xblocks > _PALLAS_MAX_XBLOCKS:
        return op.matvec_xla(x)
    dtype = x.dtype
    nb, nbp, T, nxb = p.n_blocks, p.n_blocks_pad, p.tile, p.n_xblocks
    chunk = _CHUNK

    xin = x if p.perm is None else x[p.perm]
    x2d = jnp.zeros(nxb * 128, dtype).at[:p.n].set(xin).reshape(nxb, 128)

    def kernel(bids_ref, x_ref, blocks_ref, yb_ref):
        bid = bids_ref[0, :]                                    # (chunk,)
        oh = (bid[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (chunk, nxb), 1)).astype(dtype)
        # HIGHEST: the MXU's default bf16 passes would round the gathered x
        # values (the one-hot matmul must reproduce x exactly)
        xg = jnp.dot(oh, x_ref[:], preferred_element_type=dtype,
                     precision=jax.lax.Precision.HIGHEST)       # (chunk, 128)
        yb_ref[:] = (blocks_ref[:] * xg[:, None, :]).sum(axis=-1)

    yb = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nbp, T), dtype),
        grid=(nbp // chunk,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nxb, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, T, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, T), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(p.block_ids[None, :], x2d, op.blocks)

    cs = jnp.concatenate([jnp.zeros((1, T), dtype),
                          jnp.cumsum(yb[:nb], axis=0)], axis=0)
    ts = p.tile_start
    yt = cs[ts[1:]] - cs[ts[:-1]]
    y_new = yt.reshape(-1)[:p.n]
    return y_new if p.iperm is None else y_new[p.iperm]


def bell_backed(plan, op) -> BellBackedOp:
    """Wrap an assembled ELL :class:`SparseOp` with a BELL matvec.
    ``plan``: a host :class:`BellPlan` or its :class:`BellDev`."""
    return BellBackedOp(op.data, op.cols, op.n_cols,
                        relayout_ell(plan, op.data))
