"""Element partitioning for SPMD sharding.

Equivalent of the reference's METIS partition + reorder pipeline
(``Mesh::PartitionElements_and_FillDofMapAllFEFamilies`` Mesh.hpp:451,
MeshMetisPartitioning.cpp:41-99): elements get a shard id, then elements
AND nodes are permuted so every shard owns contiguous ranges — which is
exactly what the row-sharded dof layout (parallel/spmd.py, parallel/halo.py)
wants: contiguous slabs with minimal cross-shard (halo) columns.

Partitioners (femus_tpu.native, C++ with NumPy fallback):
- "graph": BFS region growing + refinement over the element dual graph
- "rcb":   recursive coordinate bisection of centroids
- "contiguous": keep file order (the implicit default elsewhere)
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from ..fe.geom import GEOMS
from ..mesh.mesh import BoundaryFaces, Mesh, elem_neighbors
from .. import native


@dataclasses.dataclass
class PartitionInfo:
    n_shards: int
    elem_shard: np.ndarray      # (ne,) shard of each (reordered) element
    elem_offsets: np.ndarray    # (n_shards+1,) contiguous element ranges
    node_shard: np.ndarray      # (nn,) owning shard of each (reordered) node
    edge_cut: int


def partition_mesh(mesh: Mesh, n_shards: int, method: str = "rcb",
                   renumber_nodes: bool = True) -> Tuple[Mesh, PartitionInfo]:
    """Returns a reordered copy of ``mesh`` plus partition info.

    Elements are permuted shard-major; nodes (optionally) are renumbered by
    owning shard (owner = smallest shard of any adjacent element) so dof
    slabs are shard-contiguous like the reference's FillISvector node
    reorder (Mesh.hpp:504)."""
    ne = mesh.n_elems
    if method == "contiguous" or n_shards == 1:
        part = (np.arange(ne) * n_shards // ne).astype(np.int32)
    elif method == "rcb":
        cent = mesh.coords[mesh.conn[:, :GEOMS[mesh.geom].n_verts]].mean(axis=1)
        part = native.rcb_partition(cent, n_shards)
    elif method == "graph":
        part = native.greedy_graph_partition(elem_neighbors(mesh), n_shards)
    else:
        raise ValueError(f"unknown method '{method}'")

    perm = np.argsort(part, kind="stable")          # elements shard-major
    part_sorted = part[perm]
    offsets = np.searchsorted(part_sorted, np.arange(n_shards + 1))

    conn = mesh.conn[perm]
    group = mesh.elem_group[perm]
    lev = mesh.elem_level[perm] if mesh.elem_level is not None else None
    inv_perm = np.empty(ne, np.int64)
    inv_perm[perm] = np.arange(ne)

    coords = mesh.coords
    node_map = None
    if renumber_nodes:
        # owner shard of a node = smallest shard among adjacent elements
        nn = mesh.n_nodes
        owner = np.full(nn, n_shards, np.int32)
        for s in range(n_shards - 1, -1, -1):
            nodes_s = conn[offsets[s]:offsets[s + 1]].ravel()
            owner[nodes_s] = s
        node_map = np.argsort(owner, kind="stable")  # new order
        inv_node = np.empty(nn, np.int64)
        inv_node[node_map] = np.arange(nn)
        coords = mesh.coords[node_map]
        conn = inv_node[conn].astype(np.int32)
        node_shard = owner[node_map]
    else:
        node_shard = np.zeros(mesh.n_nodes, np.int32)

    out = Mesh(dim=mesh.dim, geom=mesh.geom, coords=coords, conn=conn,
               elem_group=group,
               parent_elem=(mesh.parent_elem[perm]
                            if mesh.parent_elem is not None else None),
               child_slot=(mesh.child_slot[perm]
                           if mesh.child_slot is not None else None),
               elem_level=lev,
               elem_material=(mesh.elem_material[perm]
                              if mesh.elem_material is not None else None))
    out.elem_shard = part_sorted.copy()
    # boundary faces: remap element ids and node ids
    out.boundary = {}
    for fg, bf in mesh.boundary.items():
        bconn = bf.conn
        if node_map is not None:
            bconn = inv_node[bconn].astype(np.int32)
        e_new = inv_perm[bf.elem].astype(np.int32)
        order = np.argsort(e_new, kind="stable")
        out.boundary[fg] = BoundaryFaces(
            face_geom=fg, elem=e_new[order], iface=bf.iface[order],
            group=bf.group[order], conn=bconn[order])

    cut = native.edge_cut(elem_neighbors(out), out.elem_shard)
    return out, PartitionInfo(n_shards=n_shards, elem_shard=out.elem_shard,
                              elem_offsets=offsets,
                              node_shard=node_shard, edge_cut=cut)
