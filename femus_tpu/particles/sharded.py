"""Sharded particle clouds with all_to_all migration.

Reference semantics: markers live on the MPI rank that owns their current
element; when advection walks a marker across a partition boundary the marker
is handed to the new owner (Marker.cpp GetElement cross-proc migration,
Line::AdvectionParallel per-proc hand-off loops — SURVEY.md §3.5).

TPU design: the cloud is a fixed-capacity struct-of-arrays per device shard
(dead slots carry ``elem = -1``); mesh geometry tables are replicated so a
particle's state is just (x, elem).  One advection step is a single
``shard_map``-ped kernel:

  local RK substep + neighbor-walk relocation (markers.make_advect_fn logic)
  -> destination shard = elem_owner[elem]
  -> pack out-migrating particles into (n_shards, cap_migrate) slot buffers
  -> ``jax.lax.all_to_all`` over the mesh axis
  -> merge survivors + arrivals by a stable alive-first sort (repack).

Everything is static-shape: per-peer migration capacity is a plan parameter;
overflow drops particles deterministically (counted in the returned
diagnostics, never silent).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P

from ..mesh.mesh import Mesh
from .markers import MarkerCloud, make_advect_fn


@dataclasses.dataclass
class ShardedCloudPlan:
    n_shards: int
    capacity: int            # particle slots per shard
    cap_migrate: int         # per-(src,dst) migration slots per step
    elem_owner: np.ndarray   # (n_elems,) element -> shard id


def make_plan(mesh: Mesh, n_shards: int, n_particles: int,
              cap_migrate: int = 0, slack: float = 2.0) -> ShardedCloudPlan:
    """Shard elements contiguously (matching the partitioner's
    shard-contiguous element reordering) and size the per-shard buffers."""
    n_elems = mesh.n_elems
    per = -(-n_elems // n_shards)
    owner = np.minimum(np.arange(n_elems) // per, n_shards - 1)
    capacity = max(4, int(np.ceil(slack * n_particles / n_shards)))
    cap_migrate = cap_migrate or max(2, capacity // 4)
    return ShardedCloudPlan(n_shards, capacity, cap_migrate,
                            owner.astype(np.int32))


def distribute(cloud: MarkerCloud, plan: ShardedCloudPlan
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Host-side: place each particle into a slot on its owner shard.

    Returns global (S*C, dim) x and (S*C,) elem arrays (row-sharded layout);
    dead slots have elem = -1.
    """
    S, C = plan.n_shards, plan.capacity
    dim = cloud.x.shape[1]
    x = np.zeros((S, C, dim), cloud.x.dtype)
    elem = np.full((S, C), -1, np.int64)
    fill = np.zeros(S, np.int64)
    for i in range(cloud.n):
        e = cloud.elem[i]
        if e < 0:
            continue
        s = plan.elem_owner[e]
        if fill[s] >= C:
            raise ValueError(f"shard {s} over capacity {C}")
        x[s, fill[s]] = cloud.x[i]
        elem[s, fill[s]] = e
        fill[s] += 1
    return x.reshape(S * C, dim), elem.reshape(S * C)


def collect(x, elem) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: gather live particles back from the sharded layout."""
    x = np.asarray(x)
    elem = np.asarray(elem)
    alive = elem >= 0
    return x[alive], elem[alive]


def make_sharded_advect_fn(mesh: Mesh, plan: ShardedCloudPlan,
                           dmesh: DeviceMesh, vel_families: Sequence[str],
                           order: int = 2, max_hops: int = 4,
                           axis: str = "mesh"):
    """Build step(x, elem, vel_dofs, dt) -> (x, elem, n_dropped).

    x: (S*C, dim), elem: (S*C,) both sharded by rows over ``axis``;
    vel_dofs: tuple of replicated (n_dofs,) arrays; n_dropped counts
    particles lost to migration-capacity overflow (global).
    """
    S, C, M = plan.n_shards, plan.capacity, plan.cap_migrate
    local_step = make_advect_fn(mesh, vel_families, order=order,
                                max_hops=max_hops)
    # unjitted inner: reuse the traced substep through the jitted wrapper's
    # underlying function so it inlines into the shard_map body
    inner = local_step.__wrapped__
    elem_owner = jnp.asarray(plan.elem_owner)
    dim = mesh.dim

    def shard_body(x_blk, e_blk, vel_dofs, dt):
        # x_blk (1, C, dim), e_blk (1, C) — leading shard axis of size 1
        x, e = inner(x_blk[0], e_blk[0], vel_dofs, dt)
        me = jax.lax.axis_index(axis)
        alive = e >= 0
        dest = jnp.where(alive, elem_owner[jnp.maximum(e, 0)], me)
        stay = alive & (dest == me)
        leaving = alive & (dest != me)

        # rank of each leaving particle within its destination group
        onehot = jnp.where(leaving[None, :], dest[None, :] ==
                           jnp.arange(S)[:, None], False)      # (S, C)
        rank = jnp.cumsum(onehot, axis=1) - 1                  # (S, C)
        slot = jnp.where(onehot, rank, -1).max(axis=0)         # (C,) per-particle
        dropped = jnp.sum(leaving & (slot >= M))
        ok = leaving & (slot < M)

        send_x = jnp.zeros((S, M, dim), x.dtype)
        send_e = jnp.full((S, M), -1, e.dtype)
        # non-migrating particles get an out-of-bounds destination so the
        # scatter drops them instead of clobbering slot [0, 0]
        didx = jnp.where(ok, dest, S)
        sidx = jnp.where(ok, slot, M)
        send_x = send_x.at[didx, sidx].set(x, mode="drop")
        send_e = send_e.at[didx, sidx].set(e, mode="drop")

        recv_x = jax.lax.all_to_all(send_x, axis, 0, 0)        # (S, M, dim)
        recv_e = jax.lax.all_to_all(send_e, axis, 0, 0)        # (S, M)

        # merge: survivors first, then arrivals; stable alive-first repack
        all_x = jnp.concatenate([x, recv_x.reshape(S * M, dim)])
        all_e = jnp.concatenate([jnp.where(stay, e, -1), recv_e.reshape(S * M)])
        order_ = jnp.argsort(all_e < 0, stable=True)
        packed_e = all_e[order_][:C]
        packed_x = all_x[order_][:C]
        n_over = jnp.sum(all_e >= 0) - jnp.sum(packed_e >= 0)
        return (packed_x[None], packed_e[None],
                jax.lax.psum(dropped + n_over, axis)[None])

    smapped = jax.shard_map(
        shard_body, mesh=dmesh,
        in_specs=(P(axis, None, None), P(axis, None), P(None), P()),
        out_specs=(P(axis, None, None), P(axis, None), P(axis)))

    @jax.jit
    def step(x, elem, vel_dofs, dt):
        xb = x.reshape(S, C, dim)
        eb = elem.reshape(S, C)
        xo, eo, drops = smapped(xb, eb, vel_dofs, dt)
        return xo.reshape(S * C, dim), eo.reshape(S * C), drops[0]

    return step
