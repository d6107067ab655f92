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
  converts sparsity into dense blocks).  RCM over the STACKED multi-variable
  pattern interleaves coupled variables of nearby nodes automatically,
  collapsing the KKoffset slab-major spread (measured on the nsbenc NS
  Jacobian: 110 -> 64 B/nnz at 128-wide blocks).
- Tile rows into groups of ``T`` (sublane-sized) and columns into NARROW
  ``C``-column blocks (default C=32: FEM row-neighbor clusters are ~30
  columns wide, so 128-lane blocks waste ~4x slab traffic — measured
  64 -> 26 B/nnz at C=32).  ``pack = 128 // C`` narrow blocks share one
  128-lane physical slab row, keeping the VPU/MXU lanes full.
- SpMV (Pallas, TPU): the dof ordering is banded, so each CHUNK of blocks
  touches a narrow contiguous x window.  Per chunk: dynamic-slice the
  window from the VMEM-resident x, gather the per-block C-wide x segments
  with a one-hot matmul over the WINDOW (not the whole x — the routing
  FLOPs shrink with the bandwidth, and x size no longer caps the kernel),
  multiply the dense slab chunk, and reduce each C-lane group.  Per-block
  partial sums combine with a scatter-free sorted-segment reduction
  (cumsum + boundary difference).
- Slab dtype follows the assembled data; bf16 slabs (f32 x / f32
  accumulate) halve the dominant traffic term for preconditioner-grade
  matvecs (use tile=16 so bf16 sublanes stay full).

Assembled ELL data re-lays out into the slab with ONE scatter of the n*w
ELL entries per assembly (relayout_*; amortized over the Krylov solve).
The operator quacks like SparseOp for matvec/diagonal so smoothers, MG
cycles, and Krylov consume it unchanged.  When the plan carries a
permutation, ``matvec`` pays two n-element frame gathers; solvers that run
entirely in the permuted frame should use ``to_frame``/``from_frame`` once
at the boundaries and ``matvec_frame`` inside (see SolverConfig.bell_order).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import EllPattern

# Pallas kernel geometry: packed slab rows per grid step, the one-hot
# window cap (in col-block units), and the VMEM residency cap for x.
# VMEM budget per step (v5e ~16 MiB): slab chunk _CHUNK*T*128*4 = 1 MiB
# (double-buffered 2 MiB), one-hot (_CHUNK*pack, W) <= 1024*512*4 = 2 MiB,
# resident x <= 4 MiB, window/partials small.
_CHUNK = 256
_MAX_WIN = 512
_PALLAS_MAX_X_ELEMS = 1 << 20


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
    n_xblocks: int            # col-blocks (C-wide) covering permuted x
    col_block: int            # C: columns per block (128 // pack)
    perm: np.ndarray          # (n,) new -> old dof index
    iperm: np.ndarray         # (n,) old -> new dof index
    block_ids: np.ndarray     # (nb_pad,) col-block id per block (C units)
    tile_start: np.ndarray    # (n_tiles + 1,) block range per row tile
    dest: np.ndarray          # (n*width,) slab-flat index per ELL slot
                              #            (out of bounds for padding slots)
    diag_src: np.ndarray      # (n,) slab-flat index of each row's diagonal
    nb: int                   # logical (nonempty) block count
    win_start: np.ndarray     # (n_chunks,) x-window start per chunk (C units)
    win: int                  # one-hot window width (C units, 128-padded)
    tile_ids: np.ndarray      # (nb_pad,) row-tile id per block
    twin_start: np.ndarray    # (n_chunks,) tile-window start per chunk
    twin: int                 # tile-window width (8-padded)
    chunk: int                # packed slab rows per Pallas grid step
    tile_widths: tuple = ()   # per-chunk tile-range widths (static)

    @property
    def identity(self) -> bool:
        """True when no reordering was applied (skips permute gathers)."""
        return bool(self.perm[0] == 0 and self.perm[-1] == self.n - 1
                    and np.array_equal(self.perm, np.arange(self.n)))

    @property
    def pack(self) -> int:
        return 128 // self.col_block

    @property
    def n_blocks(self) -> int:
        """Logical (nonempty) block count."""
        return self.nb

    @property
    def n_blocks_pad(self) -> int:
        return int(self.block_ids.shape[0])

    @property
    def slab_rows(self) -> int:
        """Physical (T, 128) slab rows = n_blocks_pad // pack."""
        return self.n_blocks_pad // self.pack

    def slab_bytes(self, itemsize: int = 4) -> int:
        return self.slab_rows * self.tile * 128 * itemsize

    @property
    def nnz_bytes_ratio(self) -> float:
        """Slab bytes / ideal ELL bytes (value+index) — the traffic price."""
        return self.slab_bytes() / (len(self.dest) * 8)

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
                jnp.asarray(self.win_start),
                jnp.asarray(self.tile_ids), jnp.asarray(self.twin_start),
                self.n, self.tile, self.n_xblocks, self.col_block,
                self.n_blocks, self.win, self.twin, self.n_tiles,
                self.chunk, self.tile_widths)
            object.__setattr__(self, "_dev", dev)
        return dev


def ell_block_layout(rp, cp, slots, n_rows: int, n_cols: int, tile: int,
                     n_slots: int, nb_pad: int = None,
                     pad_blocks_to: int = None, col_block: int = 128):
    """Shared blocked-layout core (used by the square BELL plan here and the
    per-shard rectangular halo layout, parallel/halo.build_local_bell).

    rp/cp: (nnz,) row/col indices in the target frame; slots: flat SOURCE
    slot per nnz (ELL or CSR order) within ``n_slots`` total slots —
    non-nnz slots get distinct out-of-bounds destinations (dropped by the
    relayout scatter).  Returns (block_ids, tile_start, dest, nb,
    dest_nnz): block_ids padded to ``nb_pad`` (or the next multiple of
    ``pad_blocks_to``), dest (n_slots,), dest_nnz the slab position per
    nnz entry (for diagonal extraction).  ``col_block`` C < 128 packs
    ``128 // C`` narrow blocks per physical 128-lane slab row; slab-flat
    destinations account for the packing."""
    C = col_block
    pack = 128 // C
    nxb = -(-n_cols // C)
    n_tiles = -(-n_rows // tile)
    key = (rp // tile) * np.int64(nxb) + cp // C
    uniq, inv = np.unique(key, return_inverse=True)
    nb = len(uniq)
    if nb_pad is None:
        pad_blocks_to = pad_blocks_to or (_CHUNK * pack)
        nb_pad = -(-max(nb, 1) // pad_blocks_to) * pad_blocks_to
    assert nb_pad >= nb and nb_pad % pack == 0
    block_ids = np.pad((uniq % nxb).astype(np.int32), (0, nb_pad - nb))
    tile_start = np.searchsorted(uniq // nxb,
                                 np.arange(n_tiles + 1)).astype(np.int32)
    b = inv.astype(np.int64)
    dest_nnz = ((b // pack * tile + rp % tile) * 128
                + (b % pack) * C + cp % C)
    dest = (nb_pad // pack) * tile * 128 + np.arange(n_slots, dtype=np.int64)
    dest[slots] = dest_nnz
    return block_ids, tile_start, dest, nb, dest_nnz


def bell_local_matvec(blocks, block_ids, tile_start, x_ext, n_rows: int,
                      n_cols: int, nb: int, col_block: int = 128):
    """XLA-form blocked matvec core: ``blocks (slab_rows, T, 128)`` against
    an extended-frame vector ``x_ext (n_cols,)``; the first ``nb`` logical
    (C-wide) blocks participate.  Shared by BellOp.matvec_xla and the
    per-shard halo matvec (parallel/halo.make_halo_spmv_bell).

    Precision note: the scatter-free segment reduction (global cumsum +
    boundary differences) accumulates a running sum across ALL tiles, so in
    float32 with non-cancelling contributions per-row results can lose a
    few digits vs a direct per-row sum.  The solver paths run f64 (or use
    the residual-corrected outer Krylov), where the slack is far below
    discretization error; for standalone f32 use, prefer
    ``jax.ops.segment_sum`` over per-block tile ids if bit-accuracy
    matters more than the ~2x reduction-cost advantage of the cumsum."""
    C = col_block
    pack = 128 // C
    T = blocks.shape[1]
    nxb = -(-n_cols // C)
    acc = jnp.promote_types(x_ext.dtype, jnp.float32)
    xp = jnp.zeros(nxb * C, x_ext.dtype).at[:n_cols].set(x_ext)
    # one C-wide row gather per block, packed along lanes like the slab
    xg = xp.reshape(nxb, C)[block_ids]                 # (nb_pad, C)
    xg = xg.reshape(-1, pack * C)                      # (slab_rows, 128)
    prod = blocks * xg[:, None, :]                     # (slab_rows, T, 128)
    if pack == 1:
        yb = prod.sum(axis=-1, dtype=acc)              # (slab_rows, T)
        yb = yb.reshape(-1, T)
    else:
        yb = prod.reshape(prod.shape[0], T, pack, C).sum(axis=-1, dtype=acc)
        yb = yb.transpose(0, 2, 1).reshape(-1, T)      # (nb_pad, T)
    cs = jnp.concatenate([jnp.zeros((1, T), yb.dtype),
                          jnp.cumsum(yb[:nb], axis=0)], axis=0)
    yt = cs[tile_start[1:]] - cs[tile_start[:-1]]
    return yt.reshape(-1)[:n_rows].astype(x_ext.dtype)


def build_bell_plan(pattern: EllPattern, tile: int = 16,
                    perm=None, col_block: int = 32) -> BellPlan:
    """Blocked-ELL layout of ``pattern``.

    ``perm``: None -> RCM ordering (densest blocks; run solves in the
    permuted frame via ``matvec_frame`` to avoid two n-element permutation
    gathers per matvec); "identity" -> no permutation (block density relies
    on the dof numbering being local, e.g. lattice meshes, patch-coherent
    refinement, or a mesh passed through ``mesh.reorder.rcm_reorder`` —
    note the stacked KKoffset variable slabs still spread each row across
    all variable blocks, so RCM-on-the-pattern beats identity on
    multi-variable systems); or an explicit (n,) ordering array.

    ``col_block`` C: columns per block.  FEM rows cluster in ~30-column
    neighbor groups, so C=32 (pack=4 per 128-lane slab row) carries ~2x
    less slab traffic than C=128 on the nsbenc NS Jacobian even after the
    row padding below; C=128 reproduces the classic layout.

    ``tile`` T: rows per block; 16 amortizes the per-chunk routing work
    over twice the slab bytes of T=8 and measures fastest for both f32 and
    bf16 slabs on v5e (fewer grid steps at slightly more row padding).

    Layout invariants (what the fused kernel relies on):
    - blocks sorted (row-tile, col-block); each TILE's block run is padded
      to a multiple of ``pack``, so one physical 128-lane slab row never
      mixes tiles -> the reduction is a full-lane row sum + one windowed
      one-hot tile matmul (no narrow-lane slicing);
    - slab rows are cut into fixed ``chunk`` grid steps at tile
      boundaries, so chunks own disjoint tile ranges and their outputs
      concatenate with static slices;
    - each chunk's blocks touch a contiguous x window (banded ordering),
      gathered by one-hot matmuls over the window only."""
    n = pattern.n_rows
    assert pattern.n_cols == n, "BELL expects a square operator"
    assert 128 % col_block == 0
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

    C = col_block
    pack = 128 // C
    T = tile
    n_tiles = -(-n // T)
    n_xblocks = -(-n // C)
    chunk = _CHUNK

    key = (rp // T) * np.int64(n_xblocks) + cp // C
    uniq, inv = np.unique(key, return_inverse=True)
    nb = len(uniq)
    tid0 = (uniq // n_xblocks).astype(np.int64)
    bid0 = (uniq % n_xblocks).astype(np.int32)
    # pad each tile's block run to a pack multiple -> single-tile slab rows
    tiles_u, tstartb = np.unique(tid0, return_index=True)
    cnt = np.diff(np.append(tstartb, nb))
    rows_pt = -(-cnt // pack)                      # slab rows per tile
    row_off = np.concatenate([[0], np.cumsum(rows_pt)]).astype(np.int64)
    rank = np.arange(nb, dtype=np.int64) - np.repeat(tstartb, cnt)
    pb1 = np.repeat(row_off[:-1] * pack, cnt) + rank
    nrows1 = int(row_off[-1])
    rowtile = np.repeat(tiles_u, rows_pt)          # (nrows1,) tile per row
    # chunk cuts in row units at tile boundaries
    cuts = [0]
    while cuts[-1] < nrows1:
        limit = cuts[-1] + chunk
        if limit >= nrows1:
            cuts.append(nrows1)
            break
        j = np.searchsorted(row_off, limit, side="right") - 1
        cut = int(row_off[j])
        if cut <= cuts[-1]:            # one tile wider than a whole chunk
            cut = limit                # degenerate seam; kernel disabled
        cuts.append(cut)
    cuts = np.asarray(cuts, np.int64)
    n_chunks = max(len(cuts) - 1, 1)
    sr = n_chunks * chunk
    # physical row of each padded row index
    chunk_of_r = np.searchsorted(cuts, np.arange(nrows1), side="right") - 1
    shift = np.arange(n_chunks, dtype=np.int64) * chunk - cuts[:-1]
    pr_of = np.arange(nrows1, dtype=np.int64) + shift[chunk_of_r]
    pb = pr_of[pb1 // pack] * pack + pb1 % pack    # final block position
    # relayout destinations per ELL slot
    prb = pb[inv]
    dest_nnz = ((prb // pack) * T + rp % T) * 128 + (prb % pack) * C + cp % C
    dest = sr * T * 128 + np.arange(n * pattern.width, dtype=np.int64)
    dest[pattern.csr_to_ell_slots()] = dest_nnz
    dest_csr = dest_nnz
    # per-chunk x windows + tile ranges (tb) with static widths
    win_start = np.zeros(n_chunks, np.int32)
    win = 1
    tb = np.zeros(n_chunks + 1, np.int64)
    tb[n_chunks] = n_tiles
    seam = False
    tid_by_row = np.zeros(sr, np.int32)
    bid_per_block = np.zeros(sr * pack, np.int32)
    bid_per_block[pb] = bid0
    for c in range(n_chunks):
        lo, hi = int(cuts[c]), int(cuts[c + 1])
        if hi > lo:
            blk_lo = np.searchsorted(pb1 // pack, lo, side="left")
            blk_hi = np.searchsorted(pb1 // pack, hi, side="left")
            ids = bid0[blk_lo:blk_hi]
            if len(ids):
                win_start[c] = ids.min()
                win = max(win, int(ids.max()) - int(ids.min()) + 1)
            tb[c] = 0 if c == 0 else rowtile[lo]
            if c > 0 and rowtile[lo - 1] >= rowtile[lo]:
                seam = True
        else:
            tb[c] = 0 if c == 0 else tb[c - 1]
    win = -(-win // 128) * 128
    win_start = np.minimum(win_start, max(n_xblocks, win) - win)
    widths = np.diff(tb)
    twin = -(-max(int(widths.max()) if len(widths) else 1, 1) // 8) * 8
    # a seam would double-emit / drop the split tile: disable the fused
    # kernel (matvec falls back to the XLA path) — unreachable for FEM
    # bandwidths, reachable only with >chunk rows of blocks in one tile
    if seam:
        twin = 1 << 30
    twin_start = tb[:-1].astype(np.int32)
    tile_widths = tuple(int(w) for w in widths)
    # padding blocks/rows index their chunk's window starts (zero values)
    pad_mask = np.ones(sr * pack, bool)
    pad_mask[pb] = False
    pad_idx = np.flatnonzero(pad_mask)
    bid_per_block[pad_idx] = win_start[pad_idx // (chunk * pack)]
    row_pad = np.ones(sr, bool)
    row_pad[pr_of] = False
    tid_by_row[pr_of] = rowtile.astype(np.int32)
    rpad_idx = np.flatnonzero(row_pad)
    tid_by_row[rpad_idx] = twin_start[rpad_idx // chunk]
    size = sr * T * 128
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
    tile_start = np.concatenate([[0], np.cumsum(
        np.bincount(tid0, minlength=n_tiles))]).astype(np.int64)
    return BellPlan(n, T, n_tiles, n_xblocks, C, perm, iperm,
                    bid_per_block, tile_start, dest, diag, nb, win_start,
                    win, tid_by_row, twin_start, twin, chunk, tile_widths)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BellDev:
    """Device-side BELL plan arrays (a pytree: pass through jit as an
    ARGUMENT — closed-over plans would bake multi-MB index constants into
    the HLO and stall XLA constant folding, like the transfer schedules in
    systems/system.py)."""

    block_ids: jnp.ndarray     # (nb_pad,) int32
    tile_start: jnp.ndarray    # (n_tiles + 1,) int32
    dest: jnp.ndarray          # (n*width,) int64 relayout destinations
    diag_src: jnp.ndarray      # (n,) int64
    perm: Optional[jnp.ndarray]    # None = identity ordering
    iperm: Optional[jnp.ndarray]
    win_start: jnp.ndarray     # (n_chunks,) int32
    tile_ids: jnp.ndarray      # (nb_pad,) int32
    twin_start: jnp.ndarray    # (n_chunks,) int32
    n: int
    tile: int
    n_xblocks: int
    col_block: int
    n_blocks: int              # logical; block_ids/slab are padded
    win: int
    twin: int
    n_tiles: int
    chunk: int
    tile_widths: tuple

    @property
    def pack(self) -> int:
        return 128 // self.col_block

    @property
    def n_blocks_pad(self) -> int:
        return int(self.block_ids.shape[0])

    @property
    def slab_rows(self) -> int:
        return self.n_blocks_pad // self.pack

    def tree_flatten(self):
        return ((self.block_ids, self.tile_start, self.dest, self.diag_src,
                 self.perm, self.iperm, self.win_start, self.tile_ids,
                 self.twin_start),
                (self.n, self.tile, self.n_xblocks, self.col_block,
                 self.n_blocks, self.win, self.twin, self.n_tiles,
                 self.chunk, self.tile_widths))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BellOp:
    """Device BELL operator (blocks slab + device plan arrays)."""

    blocks: jnp.ndarray        # (slab_rows, T, 128)
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

    # -- frame helpers: run whole solves in the permuted (banded) frame --
    def to_frame(self, x: jnp.ndarray) -> jnp.ndarray:
        return x if self.dev.perm is None else x[self.dev.perm]

    def from_frame(self, xf: jnp.ndarray) -> jnp.ndarray:
        return xf if self.dev.iperm is None else xf[self.dev.iperm]

    def matvec_frame(self, xf: jnp.ndarray) -> jnp.ndarray:
        """y_frame = A_frame x_frame — no permutation gathers; use with
        ``to_frame``/``from_frame`` at the solve boundaries."""
        # auto-route ONLY on TPU: the kernel's pltpu memory spaces do not
        # lower on other backends (GPU etc. fall back to the XLA form)
        p = self.dev
        if (jax.default_backend() == "tpu" and p.n <= _PALLAS_MAX_X_ELEMS
                and p.win <= _MAX_WIN and p.twin <= 4096):
            return _spmv_bell_pallas_frame(self, xf)
        return _matvec_xla_frame(self, xf)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.from_frame(self.matvec_frame(self.to_frame(x)))

    def matvec_xla(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.dev
        xin = x if p.perm is None else x[p.perm]
        y_new = _matvec_xla_frame(self, xin)
        return y_new if p.iperm is None else y_new[p.iperm]

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jnp.ndarray:
        return self.blocks.reshape(-1)[self.dev.diag_src]


def _matvec_xla_frame(op: "BellOp", xf: jnp.ndarray) -> jnp.ndarray:
    """XLA path of the square BELL matvec (frame-resident): one C-wide row
    gather per block, full-lane row sums (slab rows are single-tile by
    construction), segment-sum over the per-row tile ids."""
    p = op.dev
    C, pack, T = p.col_block, p.pack, p.tile
    acc = jnp.promote_types(xf.dtype, jnp.float32)
    xp = jnp.zeros(p.n_xblocks * C, xf.dtype).at[:p.n].set(xf)
    xg = xp.reshape(p.n_xblocks, C)[p.block_ids]         # (sr*pack, C)
    xg = xg.reshape(p.slab_rows, pack * C)               # (sr, 128)
    rowsum = (op.blocks * xg[:, None, :]).sum(axis=-1, dtype=acc)  # (sr, T)
    yt = jax.ops.segment_sum(rowsum, p.tile_ids, num_segments=p.n_tiles)
    return yt.reshape(-1)[:p.n].astype(xf.dtype)


def relayout_ell(plan, ell_data: jnp.ndarray, dtype=None) -> BellOp:
    """Scatter assembled ELL data into the BELL slab (one n*w scatter;
    ELL padding slots carry out-of-bounds destinations and are dropped).
    ``plan``: a host :class:`BellPlan` or its :class:`BellDev`.
    ``dtype``: slab storage dtype (e.g. jnp.bfloat16 halves the dominant
    traffic term; x and the accumulate stay in the ambient precision)."""
    dev = plan.device() if isinstance(plan, BellPlan) else plan
    dt = ell_data.dtype if dtype is None else dtype
    slab = jnp.zeros(dev.slab_rows * dev.tile * 128, dt)
    slab = slab.at[dev.dest].set(
        ell_data.reshape(-1).astype(dt), mode="drop", unique_indices=True)
    return BellOp(slab.reshape(dev.slab_rows, dev.tile, 128), dev)


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
# Pallas fused BELL SpMV: windowed gather + packed tile matvecs.
#
# The XLA path issues ~10 kernels per matvec (pad, row-gather, multiply,
# reduce, cumsum, boundary diff, slice) whose launch overheads and
# HBM-materialized intermediates cost more than the slab streaming itself.
# The fused kernel streams the slab through VMEM in chunks, keeps x
# resident in VMEM, and realizes the per-block C-wide x gather as a
# one-hot matmul over each chunk's narrow column WINDOW (scalar-prefetched
# start per chunk) — the routing FLOPs scale with the matrix bandwidth,
# not with n.  Only the cheap sorted-segment reduction (cumsum + boundary
# diff over (nb, T)) stays outside.
# ---------------------------------------------------------------------------

# routing scheme override for A/B experiments (None = auto by slab dtype)
_ROUTING_OVERRIDE = None
_DIM_SEMANTICS = ("arbitrary",)


def _spmv_bell_pallas_frame(op: BellOp, xf: jnp.ndarray) -> jnp.ndarray:
    """y_frame = A x_frame on the BELL slab via the fused windowed kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = op.dev
    dtype = xf.dtype
    C, pack, T = p.col_block, p.pack, p.tile
    W, WT, CH = p.win, p.twin, p.chunk
    sr = p.slab_rows
    n_chunks = sr // CH
    nxb_pad = max(p.n_xblocks, W)
    x2d = jnp.zeros(nxb_pad * C, dtype).at[:p.n].set(xf).reshape(nxb_pad, C)
    # Routing scheme per slab dtype:
    # - bf16 slabs ("default"): single-pass MXU dots are precision-
    #   CONSISTENT with the storage (total matvec error ~3e-3 relative) and
    #   cut the per-chunk routing cost enough to realize the halved slab
    #   traffic (measured on the L3 nsbenc Jacobian: 13.3 -> 25.8 Gnnz/s).
    # - f32 slabs ("split3"): the one-hot gather must reproduce x exactly.
    #   HIGHEST does that with 6 bf16 passes per dot; the split form gets
    #   the same exactness in 3: x = x1 + x2 + x3 with each xk a bf16
    #   round of the running residual, and each one-hot row selects a
    #   SINGLE xk entry (1.0 is exact in bf16, one product, no accumulation
    #   rounding), so oh@x1 + oh@x2 + oh@x3 rebuilds the f32 x to ~2^-25 —
    #   at half the MXU passes of HIGHEST.
    routing = _ROUTING_OVERRIDE or (
        "default" if op.blocks.dtype == jnp.bfloat16 else "split3")
    prec = (jax.lax.Precision.DEFAULT if routing == "default"
            else jax.lax.Precision.HIGHEST)

    def kernel(starts_ref, tstarts_ref, bids_ref, tids_ref, x_ref,
               blocks_ref, yt_ref):
        g = pl.program_id(0)
        s = starts_ref[g]
        t0 = tstarts_ref[g]
        lid = bids_ref[:] - s                                    # (CH, pack)
        xw = x_ref[pl.ds(s, W), :]                               # (W, C)
        iw = jax.lax.broadcasted_iota(jnp.int32, (CH, W), 1)
        if routing == "split3":
            x1 = xw.astype(jnp.bfloat16)
            r1 = xw - x1.astype(dtype)
            x2 = r1.astype(jnp.bfloat16)
            x3 = (r1 - x2.astype(dtype)).astype(jnp.bfloat16)
        segs = []
        for q in range(pack):
            if routing == "split3":
                oh = (lid[:, q:q + 1] == iw).astype(jnp.bfloat16)
                seg = sum(jnp.dot(oh, xk, preferred_element_type=dtype)
                          for xk in (x1, x2, x3))
            else:
                oh = (lid[:, q:q + 1] == iw).astype(dtype)       # (CH, W)
                seg = jnp.dot(oh, xw, preferred_element_type=dtype,
                              precision=prec)
            segs.append(seg)
        xg = segs[0] if pack == 1 else jnp.concatenate(segs, axis=1)
        prod = blocks_ref[:].astype(dtype) * xg[:, None, :]      # (CH, T, 128)
        # slab rows are single-tile: full-lane row sums + one windowed
        # one-hot tile matmul reduce straight onto (tile, row) slots
        rowsum = prod.sum(axis=-1)                               # (CH, T)
        ltid = tids_ref[:, 0] - t0                               # (CH,)
        # lane-iota form: ttT (CH, WT) compares against a LANE iota (a
        # sublane iota would force a costly relayout); contract over the
        # CH sublane dim on both sides (A^T B matmul)
        it = jax.lax.broadcasted_iota(jnp.int32, (CH, WT), 1)
        ttT = (ltid[:, None] == it).astype(dtype)                # (CH, WT)
        yt_ref[0] = jax.lax.dot_general(
            ttT, rowsum, (((0,), (0,)), ((), ())),
            preferred_element_type=dtype, precision=prec)

    yt = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((CH, pack), lambda i, s, t: (i, 0)),
                pl.BlockSpec((CH, 1), lambda i, s, t: (i, 0)),
                pl.BlockSpec((nxb_pad, C), lambda i, s, t: (0, 0)),
                pl.BlockSpec((CH, T, 128), lambda i, s, t: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, WT, T), lambda i, s, t: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_chunks, WT, T), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_DIM_SEMANTICS),
    )(p.win_start, p.twin_start, p.block_ids.reshape(sr, pack),
      p.tile_ids.reshape(sr, 1), x2d, op.blocks)

    # chunks own disjoint tile ranges (tile-aligned cuts): their outputs
    # concatenate with STATIC slices — no gathers, no dynamic updates
    pieces = [yt[c, :w] for c, w in enumerate(p.tile_widths) if w > 0]
    out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)
    return out.reshape(-1)[:p.n]


def spmv_bell_pallas(op: BellOp, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x on the BELL slab via the fused Pallas kernel (with the
    plan's frame permutations applied at the boundaries).

    Falls back to the XLA path when x is too large to sit in VMEM
    (n > _PALLAS_MAX_X_ELEMS) or a chunk's column window exceeds _MAX_WIN
    (non-banded ordering).  The slab arrives pre-padded to a chunk multiple
    (build_bell_plan), so the grid divides with no per-call copies."""
    p = op.dev
    if p.n > _PALLAS_MAX_X_ELEMS or p.win > _MAX_WIN or p.twin > 4096:
        # twin = 1<<30 marks a degenerate seam plan (same guard as
        # matvec_frame) — the kernel would allocate a (n_chunks, twin, T)
        # output; route to the XLA path instead
        return op.matvec_xla(x)
    xf = x if p.perm is None else x[p.perm]
    yf = _spmv_bell_pallas_frame(op, xf)
    return yf if p.iperm is None else yf[p.iperm]


def bell_backed(plan, op) -> BellBackedOp:
    """Wrap an assembled ELL :class:`SparseOp` with a BELL matvec.
    ``plan``: a host :class:`BellPlan` or its :class:`BellDev`."""
    return BellBackedOp(op.data, op.cols, op.n_cols,
                        relayout_ell(plan, op.data))
