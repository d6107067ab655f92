"""Halo-exchange SpMV over a device mesh (shard_map + all_to_all).

The reference's ghost-dof exchange lives inside PETSc's VecGhost/MatMult
(SURVEY.md §2.4: ``_ghostDofs`` Mesh.hpp:543).  TPU-native equivalent with a
*static* communication schedule (static sparsity -> static plan, SURVEY.md
§5.8): rows are range-partitioned; at setup the host computes, per shard
pair (src, dst), the local x entries src must ship to dst; one padded
``all_to_all`` per SpMV delivers every ghost, then the local ELL gather runs
on [own x | ghost buffer].  This is the explicit-collective fast path — the
spmd.py path instead lets the XLA partitioner insert all-gathers.
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


@dataclasses.dataclass
class HaloPlan:
    """Static plan for one row-partitioned ELL operator."""

    n_shards: int
    rows_per_shard: int          # R (padded)
    m: int                       # max ghosts per (src, dst) pair (padded)
    send_idx: np.ndarray         # (S_src, S_dst, m): local idx in src to send
    cols_local: np.ndarray       # (S * R, w) remapped ELL columns
    n_rows: int                  # original (padded) row count = S * R


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
    ghost_pos = {}                                     # (s, t) -> {col: k}
    for s in range(n_shards):
        for t in range(n_shards):
            if t == s or need[s][t] is None:
                continue
            g = need[s][t]
            send_idx[t, s, :len(g)] = g - t * R        # t sends to s
            ghost_pos[(s, t)] = {int(c): k for k, c in enumerate(g)}
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
    return HaloPlan(n_shards, R, m, send_idx, cols_local.astype(np.int32), n)


def make_halo_spmv(plan: HaloPlan, mesh: Mesh, axis: str = "mesh"):
    """Return spmv(data, x) -> y with data (n, w) and x/y (n,) all sharded by
    rows over ``axis``; one all_to_all per application."""
    S, R, m = plan.n_shards, plan.rows_per_shard, plan.m
    send_idx = jnp.asarray(plan.send_idx)              # (S, S, m)
    cols_local = jnp.asarray(plan.cols_local)
    row_sharding = NamedSharding(mesh, P(axis))

    def local(data_blk, cols_blk, send_blk, x_blk):
        # shapes per shard: (R, w), (R, w), (1, S, m), (R,)
        send = x_blk[send_blk[0]]                      # (S, m)
        recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)
        # recv: (S, m) — chunk t originates on shard t
        xfull = jnp.concatenate([x_blk, recv.reshape(-1)])
        return (data_blk * xfull[cols_blk]).sum(axis=-1)

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None, None), P(axis)),
        out_specs=P(axis))

    def spmv(data, x):
        return smapped(data, cols_local, send_idx, x)

    return spmv, row_sharding


# ---------------------------------------------------------------------------
# Blocked-ELL local SpMV (the TPU fast path of algebra/bell.py, per shard):
# the local compute of the halo SpMV above is still an element gather
# (x[cols]) which lowers to scalar loads on TPU.  Here each shard's local
# operator block is re-laid into a dense (tile x 128-lane) slab at assembly
# time (prepare), so every matvec streams contiguous HBM and the ghost
# columns ride the same all_to_all.  Per-shard layouts differ, so the plan
# arrays are stacked (S, ...) with common padded shapes and sharded along
# with the data.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LocalBellPlan:
    """Per-shard blocked-ELL layouts of the halo-local operator blocks."""

    tile: int
    nbp: int                    # common (max, padded) block count per shard
    n_xblocks: int              # 128-lane blocks covering [own | ghosts]
    n_tiles: int
    C: int                      # local frame width R + S*m
    block_ids: np.ndarray       # (S, nbp) int32
    tile_start: np.ndarray      # (S, n_tiles + 1) int32
    dest: np.ndarray            # (S, R*w) int64 slab destinations


def build_local_bell(plan: HaloPlan, pattern: EllPattern,
                     tile: int = 8) -> LocalBellPlan:
    from ..algebra.bell import ell_block_layout
    S, R, m = plan.n_shards, plan.rows_per_shard, plan.m
    w = pattern.width
    C = R + S * m
    nxb = -(-C // 128)
    n_tiles = -(-R // tile)
    per = []
    for s in range(S):
        cols_blk = plan.cols_local[s * R:(s + 1) * R]       # (R, w)
        valid_blk = pattern.valid[s * R:(s + 1) * R]
        rows = np.repeat(np.arange(R, dtype=np.int64), w)
        sel = valid_blk.ravel()
        rp, cp = rows[sel], cols_blk.ravel().astype(np.int64)[sel]
        slots = np.flatnonzero(sel)                         # ELL slot per nnz
        per.append((rp, cp, slots))
    # first pass learns per-shard block counts (a cheap unique over the
    # (row-tile, col-block) keys — not a full ell_block_layout, which would
    # rebuild the whole layout twice per shard); second pass lays out every
    # shard with the COMMON padded count so the stacked arrays shard_map
    # cleanly
    nb_max = max(len(np.unique((rp // tile) * np.int64(-(-C // 128))
                               + cp // 128)) if len(rp) else 1
                 for (rp, cp, slots) in per)
    nbp = -(-max(nb_max, 1) // 8) * 8
    block_ids = np.zeros((S, nbp), np.int32)
    tile_start = np.zeros((S, n_tiles + 1), np.int32)
    dest = np.empty((S, R * w), np.int64)
    for s, (rp, cp, slots) in enumerate(per):
        bi, ts, d, _, _ = ell_block_layout(rp, cp, slots, R, C, tile, R * w,
                                           nb_pad=nbp)
        block_ids[s], tile_start[s], dest[s] = bi, ts, d
    return LocalBellPlan(tile, nbp, nxb, n_tiles, C, block_ids, tile_start,
                         dest)


def make_halo_spmv_bell(plan: HaloPlan, pattern: EllPattern, mesh: Mesh,
                        axis: str = "mesh", tile: int = 8):
    """Returns (prepare, spmv): ``slab = prepare(data)`` re-lays assembled
    ELL data into per-shard BELL slabs (one scatter per assembly);
    ``spmv(slab, x)`` then runs the halo exchange + blocked local matvec
    (contiguous HBM streams, no element gathers)."""
    S, R, m = plan.n_shards, plan.rows_per_shard, plan.m
    lb = build_local_bell(plan, pattern, tile)
    T, nbp, nxb, n_tiles, C = lb.tile, lb.nbp, lb.n_xblocks, lb.n_tiles, lb.C
    send_idx = jnp.asarray(plan.send_idx)
    dest = jnp.asarray(lb.dest)
    bids = jnp.asarray(lb.block_ids)
    tstart = jnp.asarray(lb.tile_start)

    def local_prepare(data_blk, dest_blk):
        slab = jnp.zeros(nbp * T * 128, data_blk.dtype)
        return slab.at[dest_blk[0]].set(data_blk.reshape(-1), mode="drop",
                                        unique_indices=True)[None, :]

    prep = jax.shard_map(local_prepare, mesh=mesh,
                         in_specs=(P(axis, None), P(axis, None)),
                         out_specs=P(axis, None))

    def local_mv(slab_blk, bids_blk, ts_blk, send_blk, x_blk):
        from ..algebra.bell import bell_local_matvec
        send = x_blk[send_blk[0]]                           # (S, m)
        recv = jax.lax.all_to_all(send, axis, 0, 0, tiled=False)
        xfull = jnp.concatenate([x_blk, recv.reshape(-1)])  # (C,)
        blocks = slab_blk[0].reshape(nbp, T, 128)
        return bell_local_matvec(blocks, bids_blk[0], ts_blk[0], xfull,
                                 R, C, nbp)

    smapped = jax.shard_map(
        local_mv, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None, None), P(axis)),
        out_specs=P(axis))

    def prepare(data):
        return prep(data, dest)

    def spmv(slab, x):
        return smapped(slab, bids, tstart, send_idx, x)

    return prepare, spmv
