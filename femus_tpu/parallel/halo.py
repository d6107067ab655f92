"""Halo-exchange SpMV over a device mesh (shard_map + ppermute/all_to_all).

The reference's ghost-dof exchange lives inside PETSc's VecGhost/MatMult
(SURVEY.md §2.4: ``_ghostDofs`` Mesh.hpp:543).  TPU-native equivalent with a
*static* communication schedule (static sparsity -> static plan, SURVEY.md
§5.8): rows are range-partitioned; at setup the host computes, per shard
pair (src, dst), the local x entries src must ship to dst.

Two transports, chosen per plan:
- ``ppermute``: when the communication graph is BANDED (every pair talks
  only across a few shard-index offsets — the RCB/strip-partition common
  case), one ``lax.ppermute`` per active offset ships exactly the ghosts
  that offset needs.  Payload is O(#offsets * max_ghosts) instead of the
  dense all_to_all's O(S * max_ghosts).
- ``all_to_all``: dense fallback for arbitrary communication graphs.

Both are DOUBLE-BUFFERED (SURVEY.md §2.4 ghost row): rows whose columns are
all locally owned (the interior) are computed against the local x block
only — no data dependency on the collective — so XLA's latency-hiding
scheduler can run the interior SpMV while the ghost exchange is in flight;
the small boundary row set is then corrected with the received ghosts.
``overlap=False`` recovers the strictly sequential exchange-then-compute
plan (kept for A/B testing).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..algebra.sparse import EllPattern

# use the offset-ppermute transport when the plan's communication graph
# spans at most this many distinct shard-index offsets
_MAX_PPERMUTE_OFFSETS = 6


@dataclasses.dataclass
class HaloPlan:
    """Static plan for one row-partitioned ELL operator."""

    n_shards: int
    rows_per_shard: int          # R (padded)
    m: int                       # max ghosts per (src, dst) pair (padded)
    send_idx: np.ndarray         # (S_src, S_dst, m): local idx in src to send
    cols_local: np.ndarray       # (S * R, w) remapped ELL columns
    n_rows: int                  # original (padded) row count = S * R
    bnd_rows: np.ndarray         # (S, B) local boundary-row ids (R = pad)
    offs: Tuple[int, ...]        # active shard-index offsets (dst - src)
    off_send: Tuple[np.ndarray, ...]  # per offset d: (S, m_d) src-local idx

    @property
    def banded(self) -> bool:
        return len(self.offs) <= _MAX_PPERMUTE_OFFSETS


def build_halo_plan(pattern: EllPattern, n_shards: int) -> HaloPlan:
    n = pattern.n_rows
    assert n % n_shards == 0, "pad rows to a multiple of the shard count first"
    R = n // n_shards
    cols = pattern.cols
    owner = cols // R                                  # (n, w)
    need = [[None] * n_shards for _ in range(n_shards)]
    m = 1
    for s in range(n_shards):
        blk_cols = cols[s * R:(s + 1) * R]
        blk_owner = owner[s * R:(s + 1) * R]
        for t in range(n_shards):
            if t == s:
                continue
            ghost = np.unique(blk_cols[blk_owner == t])
            need[s][t] = ghost
            m = max(m, len(ghost))
    send_idx = np.zeros((n_shards, n_shards, m), np.int32)
    for s in range(n_shards):
        for t in range(n_shards):
            if t == s or need[s][t] is None:
                continue
            g = need[s][t]
            send_idx[t, s, :len(g)] = g - t * R        # t sends to s
    # remap columns to local frame: own -> [0, R); ghost from t -> R + t*m + k
    # (vectorized: ghost lists are sorted-unique, so position = searchsorted)
    cols_local = np.empty_like(cols)
    for s in range(n_shards):
        blk = cols[s * R:(s + 1) * R]
        own = blk - s * R
        out = np.where((blk >= s * R) & (blk < (s + 1) * R), own, 0)
        for t in range(n_shards):
            if t == s or need[s][t] is None or len(need[s][t]) == 0:
                continue
            sel = (blk // R) == t
            if not sel.any():
                continue
            out[sel] = R + t * m + np.searchsorted(need[s][t], blk[sel])
        cols_local[s * R:(s + 1) * R] = out
    cols_local = cols_local.astype(np.int32)

    # boundary rows: any VALID slot referencing a ghost column (double-buffer
    # split — these are the only rows the collective's result can touch)
    ghost_slot = (cols_local >= R) & pattern.valid
    bnd_lists = [np.flatnonzero(ghost_slot[s * R:(s + 1) * R].any(axis=1))
                 for s in range(n_shards)]
    B = max(1, max(len(b) for b in bnd_lists))
    bnd_rows = np.full((n_shards, B), R, np.int32)     # R = drop sentinel
    for s, b in enumerate(bnd_lists):
        bnd_rows[s, :len(b)] = b

    # offset-ppermute schedule: active offsets d = dst - src, and per offset
    # the (S, m_d) source-local indices src ships to src + d
    offs = sorted({s - t for s in range(n_shards) for t in range(n_shards)
                   if t != s and need[s][t] is not None and len(need[s][t])})
    off_send = []
    for d in offs:
        lens = [len(need[src + d][src]) if 0 <= src + d < n_shards
                and need[src + d][src] is not None else 0
                for src in range(n_shards)]
        m_d = max(1, max(lens))
        sa = np.zeros((n_shards, m_d), np.int32)
        for src in range(n_shards):
            if lens[src]:
                sa[src, :lens[src]] = need[src + d][src] - src * R
        off_send.append(sa)
    return HaloPlan(n_shards, R, m, send_idx, cols_local, n, bnd_rows,
                    tuple(offs), tuple(off_send))


def _make_exchange(plan: HaloPlan, axis: str, transport: str = "auto"):
    """Per-shard ghost gather: ``exchange(x_blk) -> xghost (S*m,)`` in the
    plan's local ghost frame (shard t's ghosts at [t*m, t*m + len_t)).
    Runs INSIDE shard_map.  Plan index arrays ride as replicated closures
    (small int32); the shard picks its row via ``lax.axis_index``."""
    S, R, m = plan.n_shards, plan.rows_per_shard, plan.m
    if transport == "auto":
        transport = "ppermute" if plan.banded else "all_to_all"
    if transport == "ppermute":
        perms = [[(src, src + d) for src in range(S) if 0 <= src + d < S]
                 for d in plan.offs]
        sends = [jnp.asarray(a) for a in plan.off_send]

        def exchange(x_blk):
            s_idx = jax.lax.axis_index(axis)
            # extra m-slot scratch region absorbs writes on shards with no
            # sender for an offset (ppermute delivers zeros there)
            xg = jnp.zeros((S + 1) * m, x_blk.dtype)
            for d, perm, sa in zip(plan.offs, perms, sends):
                buf = x_blk[sa[s_idx]]                 # (m_d,)
                recv = jax.lax.ppermute(buf, axis, perm)
                t = s_idx - d
                ok = (t >= 0) & (t < S)
                pos = jnp.where(ok, t * m, S * m)
                xg = jax.lax.dynamic_update_slice(xg, recv, (pos,))
            return xg[:S * m]
    else:
        send_idx = jnp.asarray(plan.send_idx)          # (S, S, m)

        def exchange(x_blk):
            s_idx = jax.lax.axis_index(axis)
            send = x_blk[send_idx[s_idx]]              # (S, m)
            recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)
            return recv.reshape(-1)

    return exchange, transport


def make_halo_spmv(plan: HaloPlan, mesh: Mesh, axis: str = "mesh",
                   overlap: bool = True, transport: str = "auto"):
    """Return spmv(data, x) -> y with data (n, w) and x/y (n,) all sharded by
    rows over ``axis``.  ``overlap=True`` (default) computes the interior
    rows independently of the ghost collective (double-buffer);
    ``transport`` picks ppermute (banded graphs) vs all_to_all."""
    S, R, m = plan.n_shards, plan.rows_per_shard, plan.m
    cols_local = jnp.asarray(plan.cols_local)
    bnd = jnp.asarray(plan.bnd_rows)                   # (S, B)
    exchange, _ = _make_exchange(plan, axis, transport)
    row_sharding = NamedSharding(mesh, P(axis))

    def local(data_blk, cols_blk, x_blk):
        # shapes per shard: (R, w), (R, w), (R,)
        xghost = exchange(x_blk)                       # (S*m,)
        if not overlap:
            xfull = jnp.concatenate([x_blk, xghost])
            return (data_blk * xfull[cols_blk]).sum(axis=-1)
        # interior pass: ghost slots read zeros — NO dependency on the
        # collective, so XLA overlaps it with the exchange
        xpad = jnp.concatenate([x_blk, jnp.zeros(S * m, x_blk.dtype)])
        y = (data_blk * xpad[cols_blk]).sum(axis=-1)
        # boundary pass: add the ghost contributions of boundary rows
        br = bnd[jax.lax.axis_index(axis)]             # (B,) R-padded
        c_b = cols_blk[br]                             # (B, w) OOB-clamped
        d_b = data_blk[br]
        g = jnp.clip(c_b - R, 0, S * m - 1)
        corr = (d_b * jnp.where(c_b >= R, xghost[g], 0.0)).sum(axis=-1)
        return y.at[br].add(corr, mode="drop")

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=P(axis))

    def spmv(data, x):
        return smapped(data, cols_local, x)

    return spmv, row_sharding


# ---------------------------------------------------------------------------
# Blocked-ELL local SpMV (the TPU fast path of algebra/bell.py, per shard):
# the local compute of the halo SpMV above is still an element gather
# (x[cols]) which lowers to scalar loads on TPU.  Here each shard's local
# operator block is re-laid into a dense (tile x 128-lane) slab at assembly
# time (prepare), so every matvec streams contiguous HBM and the ghost
# columns ride the same exchange.  Per-shard layouts differ, so the plan
# arrays are stacked (S, ...) with common padded shapes and sharded along
# with the data.  The slab is SPLIT into interior blocks (col-block fully
# inside the own range — computed against the local x only) and boundary
# blocks (touch the ghost frame — computed after the exchange lands), the
# same double-buffer as the ELL path.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LocalBellPlan:
    """Per-shard blocked-ELL layouts of the halo-local operator blocks,
    split interior/boundary for exchange overlap."""

    tile: int
    n_xblocks: int              # 128-lane blocks covering [own | ghosts]
    n_tiles: int
    C: int                      # local frame width R + S*m
    nbp_i: int                  # common padded interior block count
    nbp_b: int                  # common padded boundary block count
    block_ids_i: np.ndarray     # (S, nbp_i) int32
    tile_start_i: np.ndarray    # (S, n_tiles + 1) int32
    dest_i: np.ndarray          # (S, R*w) int64 slab destinations
    block_ids_b: np.ndarray     # (S, nbp_b)
    tile_start_b: np.ndarray
    dest_b: np.ndarray


def build_local_bell(plan: HaloPlan, pattern: EllPattern,
                     tile: int = 8) -> LocalBellPlan:
    from ..algebra.bell import ell_block_layout
    S, R, m = plan.n_shards, plan.rows_per_shard, plan.m
    w = pattern.width
    C = R + S * m
    nxb = -(-C // 128)
    n_tiles = -(-R // tile)
    ib = R // 128                      # col-blocks < ib are fully interior
    per = []
    for s in range(S):
        cols_blk = plan.cols_local[s * R:(s + 1) * R]       # (R, w)
        valid_blk = pattern.valid[s * R:(s + 1) * R]
        rows = np.repeat(np.arange(R, dtype=np.int64), w)
        sel = valid_blk.ravel()
        rp, cp = rows[sel], cols_blk.ravel().astype(np.int64)[sel]
        slots = np.flatnonzero(sel)                         # ELL slot per nnz
        interior = (cp // 128) < ib
        per.append(((rp[interior], cp[interior], slots[interior]),
                    (rp[~interior], cp[~interior], slots[~interior])))

    def n_blocks(rp, cp):
        if not len(rp):
            return 0
        return len(np.unique((rp // tile) * np.int64(nxb) + cp // 128))

    nbp_i = -(-max(max(n_blocks(*p[0][:2]) for p in per), 1) // 8) * 8
    nbp_b = -(-max(max(n_blocks(*p[1][:2]) for p in per), 1) // 8) * 8

    def layout(part, nbp):
        bids = np.zeros((S, nbp), np.int32)
        ts = np.zeros((S, n_tiles + 1), np.int32)
        dest = np.empty((S, R * w), np.int64)
        for s in range(S):
            rp, cp, slots = part(s)
            bi, t, d, _, _ = ell_block_layout(rp, cp, slots, R, C, tile,
                                              R * w, nb_pad=nbp)
            bids[s], ts[s], dest[s] = bi, t, d
        return bids, ts, dest

    bi_i, ts_i, d_i = layout(lambda s: per[s][0], nbp_i)
    bi_b, ts_b, d_b = layout(lambda s: per[s][1], nbp_b)
    return LocalBellPlan(tile, nxb, n_tiles, C, nbp_i, nbp_b,
                         bi_i, ts_i, d_i, bi_b, ts_b, d_b)


def make_halo_spmv_bell(plan: HaloPlan, pattern: EllPattern, mesh: Mesh,
                        axis: str = "mesh", tile: int = 8,
                        overlap: bool = True, transport: str = "auto"):
    """Returns (prepare, spmv): ``slabs = prepare(data)`` re-lays assembled
    ELL data into per-shard interior/boundary BELL slabs (one scatter pair
    per assembly); ``spmv(slabs, x)`` then runs the ghost exchange with the
    interior blocked matvec overlapped (contiguous HBM streams, no element
    gathers), finishing the boundary blocks once the ghosts land."""
    S, R, m = plan.n_shards, plan.rows_per_shard, plan.m
    lb = build_local_bell(plan, pattern, tile)
    T, n_tiles, C = lb.tile, lb.n_tiles, lb.C
    exchange, _ = _make_exchange(plan, axis, transport)
    dest_i = jnp.asarray(lb.dest_i)
    dest_b = jnp.asarray(lb.dest_b)
    bids_i, bids_b = jnp.asarray(lb.block_ids_i), jnp.asarray(lb.block_ids_b)
    ts_i, ts_b = jnp.asarray(lb.tile_start_i), jnp.asarray(lb.tile_start_b)

    def local_prepare(data_blk, di_blk, db_blk):
        flat = data_blk.reshape(-1)
        si = jnp.zeros(lb.nbp_i * T * 128, data_blk.dtype)
        sb = jnp.zeros(lb.nbp_b * T * 128, data_blk.dtype)
        return (si.at[di_blk[0]].set(flat, mode="drop",
                                     unique_indices=True)[None, :],
                sb.at[db_blk[0]].set(flat, mode="drop",
                                     unique_indices=True)[None, :])

    prep = jax.shard_map(local_prepare, mesh=mesh,
                         in_specs=(P(axis, None), P(axis, None),
                                   P(axis, None)),
                         out_specs=(P(axis, None), P(axis, None)))

    def local_mv(slab_i, slab_b, bi_blk, tsi_blk, bb_blk, tsb_blk, x_blk):
        from ..algebra.bell import bell_local_matvec
        xghost = exchange(x_blk)                            # (S*m,)
        if overlap:
            # interior blocks never read past R — zeros stand in for the
            # ghost frame, so this matvec has no collective dependency
            x_i = jnp.concatenate([x_blk, jnp.zeros(S * m, x_blk.dtype)])
        else:
            x_i = jnp.concatenate([x_blk, xghost])
        y = bell_local_matvec(slab_i[0].reshape(lb.nbp_i, T, 128),
                              bi_blk[0], tsi_blk[0], x_i, R, C, lb.nbp_i)
        xfull = jnp.concatenate([x_blk, xghost])
        y = y + bell_local_matvec(slab_b[0].reshape(lb.nbp_b, T, 128),
                                  bb_blk[0], tsb_blk[0], xfull, R, C,
                                  lb.nbp_b)
        return y

    smapped = jax.shard_map(
        local_mv, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None), P(axis, None), P(axis, None), P(axis)),
        out_specs=P(axis))

    def prepare(data):
        return prep(data, dest_i, dest_b)

    def spmv(slabs, x):
        return smapped(slabs[0], slabs[1], bids_i, ts_i, bids_b, ts_b, x)

    return prepare, spmv
