"""Sharded patch-stencil SpMV: patches over the device mesh.

The patch-lattice operator (algebra/patchstencil.py) shards naturally on its
patch axis — the TPU-native analogue of the reference's element-partition
domain decomposition (SURVEY.md §2.4): each device owns a contiguous slab of
coarse-element patches (weights ``wt[..., p_lo:p_hi]`` and the interior dofs
of those patches), while the SKELETON (coarse-edge/vertex values — an
O(coarse mesh) amount of data, independent of refinement depth) is
replicated.  One ``psum`` closes the skeleton partial sums; interior compute
never communicates.  Compare parallel/halo.py (general halo-plan SpMV):
here the halo is not exchanged at all — the replicated skeleton IS the
interface, so the communication volume per SpMV is O(n_edges * E) ≪ O(n).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..algebra.patchstencil import OFFSETS, PatchStencilOp


def shard_patch_op(op: PatchStencilOp, mesh: Mesh, axis: str = "mesh"):
    """Device-place the operator pieces for ``sharded_patch_matvec``.

    Returns (op_sharded, split) where the weights and patch-indexed routing
    matrices are sharded on the (padded) patch axis and the small skeleton
    factors are replicated.  ``op.meta``'s Pp must be divisible by the mesh
    axis size (build_patch_tables pads to 128 lanes; pass lanes=128*n_dev
    upstream if needed)."""
    H, Pm, Pp, E, n_edges, n_verts, n = op.meta
    n_dev = mesh.shape[axis]
    assert Pp % n_dev == 0, (Pp, n_dev)
    dev_put = lambda x, spec: jax.device_put(
        x, jax.sharding.NamedSharding(mesh, spec))
    # routing matrices reshaped to expose the patch axis, padded P -> Pp
    def pad_patch(a, ax):
        pad = [(0, 0)] * a.ndim
        pad[ax] = (0, Pp - Pm)
        return np.pad(np.asarray(a), pad)

    G_face = pad_patch(np.asarray(op.G_face).reshape(-1, 4, Pm), 2)
    G_edge = pad_patch(np.asarray(op.G_edge).reshape(8, Pm, -1), 1)
    M_cs = pad_patch(np.asarray(op.M_cs).reshape(4, Pm, -1), 1)
    M_vs = pad_patch(np.asarray(op.M_vs).reshape(-1, 4, Pm), 2)
    return {
        "wt": dev_put(op.wt, P(None, None, None, axis)),
        "G_face": dev_put(G_face, P(None, None, axis)),
        "G_edge": dev_put(G_edge, P(None, axis, None)),
        "M_cs": dev_put(M_cs, P(None, axis, None)),
        "M_vs": dev_put(M_vs, P(None, None, axis)),
        "meta": op.meta,
    }


def make_sharded_patch_matvec(meta, mesh: Mesh, axis: str = "mesh"):
    """jit-able (parts, x_int (E,E,Pp), xe (E,n_edges), xv (n_verts,)) ->
    same-structured output, with x_int sharded on its patch axis and the
    skeleton replicated."""
    H, Pm, Pp, E, n_edges, n_verts, n = meta
    from jax import shard_map

    def local(wt, G_face, G_edge, M_cs, M_vs, x_int, xe, xv):
        Pl = wt.shape[-1]
        X = jnp.zeros((H + 4, H + 4, Pl), x_int.dtype)
        X = X.at[3:1 + H, 3:1 + H, :].set(x_int)
        xef = jnp.concatenate([xe, xe[::-1, :]], axis=1)
        lines = jnp.einsum("eq,qfp->efp", xef,
                           G_face.astype(x_int.dtype))       # (E, 4, Pl)
        X = X.at[3:1 + H, 2, :].set(lines[:, 0])
        X = X.at[2 + H - 1, 3:1 + H, :].set(lines[:, 1])
        X = X.at[3:1 + H, 2 + H - 1, :].set(lines[:, 2])
        X = X.at[2, 3:1 + H, :].set(lines[:, 3])
        cv = jnp.einsum("cpv,v->cp", M_cs.astype(x_int.dtype), xv)
        X = X.at[2, 2, :].set(cv[0])
        X = X.at[2 + H - 1, 2, :].set(cv[1])
        X = X.at[2 + H - 1, 2 + H - 1, :].set(cv[2])
        X = X.at[2, 2 + H - 1, :].set(cv[3])

        Y = None
        for k, (di, dj) in enumerate(OFFSETS):
            term = wt[k] * jax.lax.slice(
                X, (2 + di, 2 + dj, 0), (2 + di + H, 2 + dj + H, Pl))
            Y = term if Y is None else Y + term

        y_int = Y[1:H - 1, 1:H - 1, :]
        lines = jnp.stack([Y[1:H - 1, 0, :], Y[H - 1, 1:H - 1, :],
                           Y[1:H - 1, H - 1, :], Y[0, 1:H - 1, :]], axis=1)
        lfl = jnp.concatenate([lines, lines[::-1]], axis=1)  # (E, 8, Pl)
        y_e = jnp.einsum("esp,spq->eq",
                         lfl.reshape(E, 8, Pl),
                         G_edge.astype(x_int.dtype).reshape(8, Pl, n_edges)
                         if G_edge.ndim == 3 else G_edge)
        cvo = jnp.stack([Y[0, 0, :], Y[H - 1, 0, :],
                         Y[H - 1, H - 1, :], Y[0, H - 1, :]])  # (4, Pl)
        y_v = jnp.einsum("vcp,cp->v", M_vs.astype(x_int.dtype), cvo)
        # skeleton partial sums close across patch shards
        y_e = jax.lax.psum(y_e, axis)
        y_v = jax.lax.psum(y_v, axis)
        return y_int, y_e, y_v

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None, axis), P(None, None, axis),
                  P(None, axis, None), P(None, axis, None),
                  P(None, None, axis),
                  P(None, None, axis), P(None, None), P(None)),
        out_specs=(P(None, None, axis), P(None, None), P(None)))


def split_vector(meta, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Global dof vector -> (x_int (E,E,Pp) patch-padded, xe, xv)."""
    H, Pm, Pp, E, n_edges, n_verts, n = meta
    n_int = E * E * Pm
    xi = x[:n_int].reshape(E, E, Pm)
    xi = jnp.pad(xi, ((0, 0), (0, 0), (0, Pp - Pm)))
    xe = x[n_int:n_int + E * n_edges].reshape(E, n_edges)
    xv = x[n_int + E * n_edges:n]
    return xi, xe, xv


def join_vector(meta, y_int, y_e, y_v) -> jnp.ndarray:
    H, Pm, Pp, E, n_edges, n_verts, n = meta
    return jnp.concatenate([y_int[:, :, :Pm].reshape(-1),
                            y_e.reshape(-1), y_v])
