"""3-D (hex) patch-lattice stencil operator — volumetric companion of
algebra/patchstencil.py (see that module + mesh/patches3d.py for design).

    (A x)|_(p,i,j,k) = sum_o wt[o, i, j, k, p] * X[i+di, j+dj, k+dk, p]

125 shifted multiply-adds (biquadratic halo 2) over batched (H x H x H)
patch lattices, patch axis on lanes.  Skeleton glue (coarse faces with D4
orientation transforms, coarse edges with arbitrary valence, coarse
vertices) is routed with one-hot matmuls sized by the COARSE mesh.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.patches3d import C8, D4, E12, F6, PatchPlan3D, d4_inverse


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


OFFSETS3 = [(a, b, c) for a in range(-2, 3) for b in range(-2, 3)
            for c in range(-2, 3)]
K3 = len(OFFSETS3)                    # 125


def _d4_array(t: int, arr):
    """out[u, v, ...] = arr[sigma_t(u, v), ...] on square leading axes."""
    au, mu, mv = D4[t]
    tmp = arr
    if mu:
        tmp = tmp[::-1]
    if mv:
        tmp = tmp[:, ::-1]
    if au == 1:
        tmp = tmp.swapaxes(0, 1)
    return tmp


# local-edge placement geometry: (axis along edge, start corner, direction)
def _edge_geom(li: int, M: int):
    a, b = E12[li]
    A, B = C8[a] * M, C8[b] * M
    d = B - A
    ax = int(np.argmax(np.abs(d)))
    return ax, A, int(np.sign(d[ax]))


def _face_geom(f: int, M: int):
    q = F6[f]
    O = C8[q[0]] * M
    U = C8[q[1]] - C8[q[0]]
    V = C8[q[3]] - C8[q[0]]
    Wn = np.cross(U, V)
    ax = int(np.argmax(np.abs(Wn)))
    return O, U, V, ax


@dataclasses.dataclass(frozen=True)
class PatchTables3D:
    H: int
    P: int
    Pp: int
    E: int
    n_faces: int
    n_edges: int
    n_verts: int
    n: int
    G_face_in: np.ndarray            # (8*n_faces, 6P)
    G_face_out: np.ndarray           # (8*6P, n_faces)
    G_edge_in: np.ndarray            # (2*n_edges, 12P)
    G_edge_out: np.ndarray           # (2*12P, n_edges)
    M_cs: np.ndarray                 # (8P, n_verts)
    M_vs: np.ndarray                 # (n_verts, 8P)
    owner: np.ndarray                # (H, H, H, Pp) bool


def build_patch_tables_3d(plan: PatchPlan3D, lanes: int = 128) -> PatchTables3D:
    P, H, E, M = plan.P, plan.H, plan.E, plan.H - 1
    nf, ne_, nv_ = plan.n_faces, plan.n_edges, plan.n_verts
    Pp = _round_up(P, lanes)
    n = plan.n_int + E * E * nf + E * ne_ + nv_

    G_face_in = np.zeros((8 * nf, 6 * P), np.float32)
    G_face_out = np.zeros((8 * 6 * P, nf), np.float32)
    for p in range(P):
        for f in range(6):
            fid = plan.patch_faces[p, f]
            t = int(plan.patch_face_tf[p, f])
            G_face_in[t * nf + fid, f * P + p] = 1.0
            s = d4_inverse(t)
            G_face_out[(s * 6 + f) * P + p, fid] = 1.0

    G_edge_in = np.zeros((2 * ne_, 12 * P), np.float32)
    G_edge_out = np.zeros((2 * 12 * P, ne_), np.float32)
    for p in range(P):
        for le in range(12):
            e = plan.patch_edges[p, le]
            fl = int(plan.patch_edge_flip[p, le])
            G_edge_in[fl * ne_ + e, le * P + p] = 1.0
            G_edge_out[(fl * 12 + le) * P + p, e] = 1.0

    M_cs = np.zeros((8 * P, nv_), np.float32)
    M_vs = np.zeros((nv_, 8 * P), np.float32)
    for p in range(P):
        for c in range(8):
            v = plan.patch_verts[p, c]
            M_cs[c * P + p, v] = 1.0
            M_vs[v, c * P + p] = 1.0

    owner = np.zeros((H, H, H, Pp), bool)
    owner[1:M, 1:M, 1:M, :P] = True
    for fid in range(nf):
        p, f, t = plan.face_sides[fid, 0]
        O, U, V, ax = _face_geom(int(f), M)
        idx = [None, None, None]
        uu, vv = np.meshgrid(np.arange(1, M), np.arange(1, M), indexing="ij")
        pos = O[None, None, :] + uu[..., None] * U + vv[..., None] * V
        owner[pos[..., 0], pos[..., 1], pos[..., 2], p] = True
    for eid in range(ne_):
        p, le, fl = plan.edge_sides[eid, 0]
        ax, A, sg = _edge_geom(int(le), M)
        ts = np.arange(1, M)
        pos = np.broadcast_to(A, (M - 1, 3)).copy()
        pos[:, ax] = A[ax] + sg * ts if sg > 0 else A[ax] - ts
        owner[pos[:, 0], pos[:, 1], pos[:, 2], p] = True
    for vid in range(nv_):
        p, c = plan.vert_sides[vid, 0]
        cc = C8[c] * M
        owner[cc[0], cc[1], cc[2], p] = True

    return PatchTables3D(H=H, P=P, Pp=Pp, E=E, n_faces=nf, n_edges=ne_,
                         n_verts=nv_, n=n, G_face_in=G_face_in,
                         G_face_out=G_face_out, G_edge_in=G_edge_in,
                         G_edge_out=G_edge_out, M_cs=M_cs, M_vs=M_vs,
                         owner=owner)


def build_patch_slots_3d(plan: PatchPlan3D,
                         tab: PatchTables3D) -> Tuple[np.ndarray, int]:
    H, Pp = tab.H, tab.Pp
    lat = plan.elem_node_lat                       # (ne, 27, 3)
    p = plan.elem_patch[:, None, None]
    ra = lat[:, :, None, :]
    rb = lat[:, None, :, :]
    d = rb - ra + 2                                 # (ne, 27, 27, 3)
    k = (d[..., 0] * 5 + d[..., 1]) * 5 + d[..., 2]
    ia, ja, ka = ra[..., 0], ra[..., 1], ra[..., 2]
    slots = (((k * H + ia) * H + ja) * H + ka) * Pp + p
    return slots.astype(np.int64), K3 * H * H * H * Pp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PatchStencilOp3D:
    wt: jnp.ndarray                   # (K3, H, H, H, Pp)
    G_face_in: jnp.ndarray
    G_face_out: jnp.ndarray
    G_edge_in: jnp.ndarray
    G_edge_out: jnp.ndarray
    M_cs: jnp.ndarray
    M_vs: jnp.ndarray
    meta: Tuple[int, ...]             # H,P,Pp,E,n_faces,n_edges,n_verts,n

    def tree_flatten(self):
        return ((self.wt, self.G_face_in, self.G_face_out, self.G_edge_in,
                 self.G_edge_out, self.M_cs, self.M_vs), (self.meta,))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, aux[0])

    @property
    def n_rows(self) -> int:
        return self.meta[7]

    def _patch_field(self, x: jnp.ndarray) -> jnp.ndarray:
        H, P, Pp, E, nf, ne_, nv_, n = self.meta
        M = H - 1
        dt = x.dtype
        n_int = E ** 3 * P
        X = jnp.zeros((H + 4, H + 4, H + 4, Pp), dt)
        xi = x[:n_int].reshape(E, E, E, P)
        X = X.at[3:1 + H, 3:1 + H, 3:1 + H, :P].set(xi)

        # faces: 8 D4 copies -> one-hot route -> 6 slabs per patch
        xf = x[n_int:n_int + E * E * nf].reshape(E, E, nf)
        xf8 = jnp.concatenate([_d4_array(t, xf) for t in range(8)], axis=2)
        lines = (xf8.reshape(E * E, 8 * nf) @ self.G_face_in.astype(dt)
                 ).reshape(E, E, 6, P)
        for f in range(6):
            O, U, V, ax = _face_geom(f, M)
            sl = [slice(2 + int(O[d]), 3 + int(O[d])) for d in range(3)]
            ua = int(np.argmax(np.abs(U)))
            va = int(np.argmax(np.abs(V)))
            blk = lines[:, :, f, :]                      # (u, v, P)
            if int(U[ua]) < 0:
                blk = blk[::-1]
            if int(V[va]) < 0:
                blk = blk[:, ::-1]
            if ua > va:                                  # axis order in X
                blk = blk.swapaxes(0, 1)
            lo, hi = min(ua, va), max(ua, va)
            sl[lo] = slice(3, 1 + H)
            sl[hi] = slice(3, 1 + H)
            sh = tuple(E if d in (ua, va) else 1 for d in range(3)) + (P,)
            X = X.at[sl[0], sl[1], sl[2], :P].set(blk.reshape(sh))
        # edges
        xe = x[n_int + E * E * nf:n_int + E * E * nf + E * ne_].reshape(E, ne_)
        xef = jnp.concatenate([xe, xe[::-1, :]], axis=1)
        elines = (xef @ self.G_edge_in.astype(dt)).reshape(E, 12, P)
        for le in range(12):
            ax, A, sg = _edge_geom(le, M)
            blk = elines[:, le, :]
            if sg < 0:
                blk = blk[::-1]
            sl = [slice(2 + int(A[d]), 3 + int(A[d])) for d in range(3)]
            sl[ax] = slice(3, 1 + H)
            X = X.at[sl[0], sl[1], sl[2], :P].set(
                blk.reshape(*(blk.shape[0] if d == ax else 1
                              for d in range(3)), P))
        # vertices
        xv = x[n_int + E * E * nf + E * ne_:n]
        cv = (self.M_cs.astype(dt) @ xv).reshape(8, P)
        for c in range(8):
            cc = C8[c] * M
            X = X.at[2 + cc[0], 2 + cc[1], 2 + cc[2], :P].set(cv[c])
        return X

    def _collect(self, Y: jnp.ndarray) -> jnp.ndarray:
        H, P, Pp, E, nf, ne_, nv_, n = self.meta
        M = H - 1
        dt = Y.dtype
        n_int = E ** 3 * P
        y_int = Y[1:M, 1:M, 1:M, :P].reshape(n_int)

        # face slabs per local face, in the face's own (u, v) order
        fl = []
        for f in range(6):
            O, U, V, ax = _face_geom(f, M)
            sl = [slice(int(O[d]), int(O[d]) + 1) for d in range(3)]
            ua = int(np.argmax(np.abs(U)))
            va = int(np.argmax(np.abs(V)))
            lo, hi = min(ua, va), max(ua, va)
            sl[ua] = slice(1, M)
            sl[va] = slice(1, M)
            blk = Y[sl[0], sl[1], sl[2], :P].reshape(E, E, P)
            # blk axes currently (lower-axis, higher-axis); reorder to (u, v)
            if ua > va:
                blk = blk.swapaxes(0, 1)
            if int(U[ua]) < 0:
                blk = blk[::-1]
            if int(V[va]) < 0:
                blk = blk[:, ::-1]
            fl.append(blk)
        lines = jnp.stack(fl, axis=2)                    # (E, E, 6, P)
        z = [_d4_array(t, lines) for t in range(8)]
        Z = jnp.stack(z, axis=2)                         # (E, E, 8, 6, P)
        y_f = (Z.reshape(E * E, 8 * 6 * P) @ self.G_face_out.astype(dt)
               ).reshape(E * E * nf)

        el = []
        for le in range(12):
            ax, A, sg = _edge_geom(le, M)
            sl = [slice(int(A[d]), int(A[d]) + 1) for d in range(3)]
            sl[ax] = slice(1, M)
            blk = Y[sl[0], sl[1], sl[2], :P].reshape(E, P)
            if sg < 0:
                blk = blk[::-1]
            el.append(blk)
        elines = jnp.stack(el, axis=1)                   # (E, 12, P)
        ef = elines.reshape(E, 12 * P)
        efl = jnp.concatenate([ef, ef[::-1, :]], axis=1)  # (E, 2*12P)
        y_e = (efl @ self.G_edge_out.astype(dt)).reshape(E * ne_)

        cvo = jnp.stack([Y[tuple(C8[c] * M)][:P] for c in range(8)]
                        ).reshape(8 * P)
        y_v = self.M_vs.astype(dt) @ cvo
        return jnp.concatenate([y_int, y_f, y_e, y_v])

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        H = self.meta[0]
        X = self._patch_field(x)
        Y = None
        for k, (di, dj, dk) in enumerate(OFFSETS3):
            term = self.wt[k] * jax.lax.slice(
                X, (2 + di, 2 + dj, 2 + dk, 0),
                (2 + di + H, 2 + dj + H, 2 + dk + H, X.shape[3]))
            Y = term if Y is None else Y + term
        return self._collect(Y)

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jnp.ndarray:
        k0 = OFFSETS3.index((0, 0, 0))
        return self._collect(self.wt[k0])

    def to_dense(self) -> jnp.ndarray:
        n = self.n_rows
        return jax.vmap(self.matvec, in_axes=1, out_axes=1)(
            jnp.eye(n, dtype=self.wt.dtype))


def dirichlet_eliminate_3d(op: PatchStencilOp3D, dir_mask: jnp.ndarray,
                           owner: jnp.ndarray) -> PatchStencilOp3D:
    H = op.meta[0]
    D = op._patch_field(dir_mask.astype(op.wt.dtype))
    core = jax.lax.slice(D, (2, 2, 2, 0),
                         (2 + H, 2 + H, 2 + H, D.shape[3])) > 0.5
    k0 = OFFSETS3.index((0, 0, 0))
    new = []
    for k, (di, dj, dk) in enumerate(OFFSETS3):
        shifted = jax.lax.slice(
            D, (2 + di, 2 + dj, 2 + dk, 0),
            (2 + di + H, 2 + dj + H, 2 + dk + H, D.shape[3])) > 0.5
        w = jnp.where(core | shifted, 0.0, op.wt[k])
        if k == k0:
            w = jnp.where(core & owner, 1.0, w)
        new.append(w)
    return PatchStencilOp3D(jnp.stack(new), op.G_face_in, op.G_face_out,
                            op.G_edge_in, op.G_edge_out, op.M_cs, op.M_vs,
                            op.meta)


def make_patch_op_3d(tab: PatchTables3D, wt: jnp.ndarray) -> PatchStencilOp3D:
    return PatchStencilOp3D(
        wt, jnp.asarray(tab.G_face_in), jnp.asarray(tab.G_face_out),
        jnp.asarray(tab.G_edge_in), jnp.asarray(tab.G_edge_out),
        jnp.asarray(tab.M_cs), jnp.asarray(tab.M_vs),
        (tab.H, tab.P, tab.Pp, tab.E, tab.n_faces, tab.n_edges,
         tab.n_verts, tab.n))
