"""Patch-lattice stencil operator: near-roofline SpMV on refined meshes.

Companion of mesh/patches.py (see its docstring for the design rationale):
on a patch-coherently renumbered refined mesh the operator splits exactly as

    A = sum_p  S_p^T A_p S_p

with A_p the patch-local operator (contributions of the elements INSIDE
coarse element p — every fine element belongs to exactly one patch, so the
split is exact, with no halo: A_p only couples nodes of patch p's own
(H x H) lattice).  Each A_p is a variable-coefficient 25-point lattice
stencil (biquadratic Q2), stored batched as ``wt[k, i, j, p]``:

    (A x)|_(p,i,j) = sum_k  wt[k, i, j, p] * X[i + di_k, j + dj_k, p]

evaluated as 25 full-array shifted multiply-adds — the formulation XLA
streams at near HBM roofline (measured on v5e: ~370 GB/s, vs < 0.2 GB/s for
ANY gather shape and ~65 GB/s for dot_general matvecs).  Skeleton rows
(coarse-edge / coarse-vertex nodes) appear in several patches; their glue
(x routing into patch boundaries, partial-sum combination) is therefore
implemented as ONE-HOT MATMULS — static routing matrices sized by the
COARSE mesh only (independent of refinement depth), turning the would-be
gathers into tiny MXU contractions.

Assembly targets this layout DIRECTLY: ``build_patch_slots`` maps each
element-Jacobian entry to its (k, i, j, p) weight slot, consumed by the
engine's alternate-layout scatter — no ELL intermediate; symmetric
Dirichlet elimination is done in stencil form (shifted masks,
``dirichlet_eliminate``).  Reference equivalent of the whole module: PETSc
MatMult inside KSPSolve (SURVEY.md §3.2 hot loops).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh.patches import PatchPlan


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


OFFSETS = [(di, dj) for di in range(-2, 3) for dj in range(-2, 3)]
K = len(OFFSETS)                      # 25 (biquadratic halo 2)


@dataclasses.dataclass(frozen=True)
class PatchTables:
    """Host-side routing tables (built once per mesh/plan).

    The one-hot matrices are sized by the COARSE mesh (P patches, n_edges
    coarse edges, n_verts coarse vertices) — constant in refinement depth.
    """

    H: int
    P: int
    Pp: int                           # P padded to the lane multiple
    E: int
    n_edges: int
    n_verts: int
    n: int                            # total dofs
    G_face: np.ndarray                # (2*n_edges, 4P): xef -> face lines
    G_edge: np.ndarray                # (8P, n_edges): face lines -> edge sums
    M_cs: np.ndarray                  # (4P, n_verts): xv -> patch corners
    M_vs: np.ndarray                  # (n_verts, 4P): corner sums -> y_v
    owner: np.ndarray                 # (H, H, Pp) bool: this patch copy owns
                                      # the row (used for Dirichlet identity)


def build_patch_tables(plan: PatchPlan, lanes: int = 128) -> PatchTables:
    P, H, E = plan.P, plan.H, plan.E
    ne_, nv_ = plan.n_edges, plan.n_verts
    Pp = _round_up(P, lanes)
    n = plan.n_int + E * ne_ + nv_

    # x routing: face line (f, p) reads edge e straight (col e) or flipped
    # (col n_edges + e) of the stacked (E, 2*n_edges) edge matrix
    G_face = np.zeros((2 * ne_, 4 * P), np.float32)
    for p in range(P):
        for f in range(4):
            e = plan.patch_edges[p, f]
            fl = int(plan.patch_edge_flip[p, f])
            G_face[fl * ne_ + e, f * P + p] = 1.0

    # y routing: edge e sums its (<=2) face lines; flipped sides read the
    # reversed copy, so source column = flip*4P + f*P + p of (E, 8P)
    G_edge = np.zeros((8 * P, ne_), np.float32)
    for e in range(ne_):
        for s in range(2):
            p, f, fl = plan.edge_sides[e, s]
            if p >= 0:
                G_edge[fl * 4 * P + f * P + p, e] = 1.0

    M_cs = np.zeros((4 * P, nv_), np.float32)
    M_vs = np.zeros((nv_, 4 * P), np.float32)
    for p in range(P):
        for c in range(4):
            v = plan.patch_verts[p, c]
            M_cs[c * P + p, v] = 1.0
            M_vs[v, c * P + p] = 1.0

    owner = np.zeros((H, H, Pp), bool)
    owner[1:H - 1, 1:H - 1, :P] = True
    for e in range(ne_):
        p, f, fl = plan.edge_sides[e, 0]
        ii, jj = _face_line_idx(H, int(f))
        owner[ii, jj, p] = True
    corner_lat = [(0, 0), (H - 1, 0), (H - 1, H - 1), (0, H - 1)]
    for v in range(nv_):
        p, c = plan.vert_sides_idx[v, 0]
        ci, cj = corner_lat[int(c)]
        owner[ci, cj, p] = True

    return PatchTables(H=H, P=P, Pp=Pp, E=E, n_edges=ne_, n_verts=nv_, n=n,
                       G_face=G_face, G_edge=G_edge, M_cs=M_cs, M_vs=M_vs,
                       owner=owner)


def _face_line_idx(H: int, f: int):
    """Lattice (i, j) index arrays of face f's interior line, face order.

    Faces: 0: j=0 row; 1: i=H-1 col; 2: j=H-1 row; 3: i=0 col."""
    r = np.arange(1, H - 1)
    if f == 0:
        return r, np.zeros_like(r)
    if f == 1:
        return np.full_like(r, H - 1), r
    if f == 2:
        return r, np.full_like(r, H - 1)
    return np.zeros_like(r), r


def build_patch_slots(plan: PatchPlan, tab: PatchTables,
                      nv: int = 1) -> Tuple[np.ndarray, int]:
    """(ne, nv*n_bq, nv*n_bq) flat weight-slot index per element-Jacobian
    entry for a stacked system of ``nv`` biquadratic unknowns.

    Weight layout: flat = ((((vr*nv + vc)*K + k)*H + i)*H + j)*Pp + p for
    row lattice (i, j) of patch p, variable blocks (vr, vc), offset
    k = (di+2)*5 + (dj+2) with (di, dj) = col - row."""
    H, Pp = tab.H, tab.Pp
    lat = plan.elem_node_lat                        # (ne, n_bq, 2)
    ne, n_bq = lat.shape[:2]
    p = plan.elem_patch[:, None, None]
    ia, ja = lat[:, :, None, 0], lat[:, :, None, 1]
    ib, jb = lat[:, None, :, 0], lat[:, None, :, 1]
    k = (ib - ia + 2) * 5 + (jb - ja + 2)
    base = ((k * H + ia) * H + ja) * Pp + p         # (ne, n_bq, n_bq)
    if nv == 1:
        return base.astype(np.int64), K * H * H * Pp
    blk = K * H * H * Pp
    out = np.empty((ne, nv * n_bq, nv * n_bq), np.int64)
    for vr in range(nv):
        for vc in range(nv):
            out[:, vr * n_bq:(vr + 1) * n_bq, vc * n_bq:(vc + 1) * n_bq] = \
                base + (vr * nv + vc) * blk
    return out, nv * nv * blk


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PatchStencilOp:
    """Device operator: stencil weights + one-hot skeleton routing."""

    wt: jnp.ndarray                   # (K, H, H, Pp)
    G_face: jnp.ndarray
    G_edge: jnp.ndarray
    M_cs: jnp.ndarray
    M_vs: jnp.ndarray
    meta: Tuple[int, int, int, int, int, int, int]   # H,P,Pp,E,n_edges,n_verts,n

    def tree_flatten(self):
        return ((self.wt, self.G_face, self.G_edge, self.M_cs, self.M_vs),
                (self.meta,))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, aux[0])

    @property
    def n_rows(self) -> int:
        return self.meta[6]

    # ---- x -> batched patch lattices (zero ring of 2 for the shifts) ----
    def _patch_field(self, x: jnp.ndarray) -> jnp.ndarray:
        H, P, Pp, E, n_edges, n_verts, n = self.meta
        dt = x.dtype
        n_int = E * E * P
        X = jnp.zeros((H + 4, H + 4, Pp), dt)
        xi = x[:n_int].reshape(E, E, P)
        X = X.at[3:1 + H, 3:1 + H, :P].set(xi)
        xe = x[n_int:n_int + E * n_edges].reshape(E, n_edges)
        xef = jnp.concatenate([xe, xe[::-1, :]], axis=1)     # straight|flipped
        lines = (xef @ self.G_face.astype(dt)).reshape(E, 4, P)
        X = X.at[3:1 + H, 2, :P].set(lines[:, 0])
        X = X.at[2 + H - 1, 3:1 + H, :P].set(lines[:, 1])
        X = X.at[3:1 + H, 2 + H - 1, :P].set(lines[:, 2])
        X = X.at[2, 3:1 + H, :P].set(lines[:, 3])
        xv = x[n_int + E * n_edges:]
        cv = (self.M_cs.astype(dt) @ xv).reshape(4, P)
        X = X.at[2, 2, :P].set(cv[0])
        X = X.at[2 + H - 1, 2, :P].set(cv[1])
        X = X.at[2 + H - 1, 2 + H - 1, :P].set(cv[2])
        X = X.at[2, 2 + H - 1, :P].set(cv[3])
        return X

    # ---- batched patch result -> global vector --------------------------
    def _collect(self, Y: jnp.ndarray) -> jnp.ndarray:
        H, P, Pp, E, n_edges, n_verts, n = self.meta
        dt = Y.dtype
        n_int = E * E * P
        y_int = Y[1:H - 1, 1:H - 1, :P].reshape(n_int)
        lines = jnp.stack([Y[1:H - 1, 0, :P], Y[H - 1, 1:H - 1, :P],
                           Y[1:H - 1, H - 1, :P], Y[0, 1:H - 1, :P]],
                          axis=1)                            # (E, 4, P)
        lf = lines.reshape(E, 4 * P)
        lfl = jnp.concatenate([lf, lf[::-1, :]], axis=1)     # (E, 8P)
        y_e = lfl @ self.G_edge.astype(dt)                   # (E, n_edges)
        cv = jnp.stack([Y[0, 0, :P], Y[H - 1, 0, :P],
                        Y[H - 1, H - 1, :P], Y[0, H - 1, :P]]).reshape(-1)
        y_v = self.M_vs.astype(dt) @ cv                      # (n_verts,)
        return jnp.concatenate([y_int, y_e.reshape(-1), y_v])

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        # TPU: fused patch kernel (one pass over the wt slab, X assembly +
        # 25 shifted MACs + boundary extraction in VMEM); XLA path is the
        # portable fallback and the reference for its correctness test
        if jax.default_backend() == "tpu":
            return spmv_patch_pallas(self, x)
        return self._matvec_xla(x)

    def _matvec_xla(self, x: jnp.ndarray) -> jnp.ndarray:
        H = self.meta[0]
        X = self._patch_field(x)
        Y = None
        for k, (di, dj) in enumerate(OFFSETS):
            term = self.wt[k] * jax.lax.slice(
                X, (2 + di, 2 + dj, 0), (2 + di + H, 2 + dj + H, X.shape[2]))
            Y = term if Y is None else Y + term
        return self._collect(Y)

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jnp.ndarray:
        k0 = OFFSETS.index((0, 0))
        return self._collect(self.wt[k0])

    def to_dense(self) -> jnp.ndarray:
        n = self.n_rows
        return jax.vmap(self._matvec_xla, in_axes=1, out_axes=1)(
            jnp.eye(n, dtype=self.wt.dtype))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockPatchStencilOp:
    """Stacked system of nv biquadratic unknowns: per-block patch stencils.

    wt[(vr*nv + vc)*K + k] couples row variable vr to column variable vc —
    a (nv x nv)-block operator whose every block is a 25-point patch
    stencil; the skeleton routing is shared across variables (same node
    lattice for every biquadratic unknown).
    """

    wt: jnp.ndarray                   # (nv*nv*K, H, H, Pp)
    G_face: jnp.ndarray
    G_edge: jnp.ndarray
    M_cs: jnp.ndarray
    M_vs: jnp.ndarray
    meta: Tuple[int, ...]             # H,P,Pp,E,n_edges,n_verts,n_per_var,nv

    def tree_flatten(self):
        return ((self.wt, self.G_face, self.G_edge, self.M_cs, self.M_vs),
                (self.meta,))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, aux[0])

    @property
    def nv(self) -> int:
        return self.meta[7]

    @property
    def n_rows(self) -> int:
        return self.meta[6] * self.meta[7]

    def _scalar(self, wt=None) -> PatchStencilOp:
        return PatchStencilOp(self.wt if wt is None else wt, self.G_face,
                              self.G_edge, self.M_cs, self.M_vs,
                              self.meta[:7])

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        # TPU: fused per-(vr, vc) patch kernels — pays once each pair's wt
        # slab dominates the launches (measured: slower at H=17 where the
        # XLA whole-program fusion wins, faster at H>=33)
        H, _, Pp = self.meta[0], self.meta[1], self.meta[2]
        pair_bytes = K * H * H * Pp * 4
        if jax.default_backend() == "tpu" and pair_bytes >= 8 << 20:
            return spmv_block_patch_pallas(self, x)
        return self._matvec_xla(x)

    def _matvec_xla(self, x: jnp.ndarray) -> jnp.ndarray:
        H = self.meta[0]
        nb = self.meta[6]
        nv = self.nv
        proto = self._scalar()
        X = [proto._patch_field(x[v * nb:(v + 1) * nb]) for v in range(nv)]
        out = []
        for vr in range(nv):
            Y = None
            for vc in range(nv):
                for k, (di, dj) in enumerate(OFFSETS):
                    w = self.wt[(vr * nv + vc) * K + k]
                    term = w * jax.lax.slice(
                        X[vc], (2 + di, 2 + dj, 0),
                        (2 + di + H, 2 + dj + H, X[vc].shape[2]))
                    Y = term if Y is None else Y + term
            out.append(proto._collect(Y))
        return jnp.concatenate(out)

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jnp.ndarray:
        k0 = OFFSETS.index((0, 0))
        proto = self._scalar()
        nv = self.nv
        return jnp.concatenate([
            proto._collect(self.wt[(v * nv + v) * K + k0])
            for v in range(nv)])

    def to_dense(self) -> jnp.ndarray:
        n = self.n_rows
        return jax.vmap(self._matvec_xla, in_axes=1, out_axes=1)(
            jnp.eye(n, dtype=self.wt.dtype))


# ---------------------------------------------------------------------------
# Fused Pallas patch SpMV (TPU): one kernel streams the wt slab once and
# does the whole per-patch work in VMEM — X-window assembly from the
# precomputed interior/line/corner blocks (full-lane sublane writes), the
# 25 shifted multiply-adds, and the boundary extraction.  The XLA path
# above materializes X and Y in HBM and runs ~16 separate ops per matvec
# (launch overhead + extra HBM passes were ~2.5x the wt streaming time on
# v5e — the r4 patch bench's 43-68 Gnnz/s vs a ~190 traffic bound).  The
# skeleton routing dots (G_face/G_edge/M_cs/M_vs — coarse-mesh-sized)
# stay outside: they are tiny MXU calls on E x 4P arrays.
# ---------------------------------------------------------------------------


def _patch_inputs(meta, G_face, M_cs, x):
    """x -> blocked patch inputs (interior lattice, routed face lines,
    routed corners) — tiny dots + one pad each, shared by the scalar and
    block fused paths."""
    H, P, Pp, E, n_edges, n_verts, n = meta
    dt = x.dtype
    n_int = E * E * P
    xi = jnp.zeros((E, E, Pp), dt).at[:, :, :P].set(
        x[:n_int].reshape(E, E, P))
    xe = x[n_int:n_int + E * n_edges].reshape(E, n_edges)
    xef = jnp.concatenate([xe, xe[::-1, :]], axis=1)
    lines = jnp.zeros((E, 4, Pp), dt).at[:, :, :P].set(
        (xef @ G_face.astype(dt)).reshape(E, 4, P))
    xv = x[n_int + E * n_edges:]
    cv = jnp.zeros((4, Pp), dt).at[:, :P].set(
        (M_cs.astype(dt) @ xv).reshape(4, P))
    return xi, lines, cv


def _patch_chunk_call(wt, xi, lines, cv, meta):
    """The fused kernel proper: one pass over a (K, H, H, Pp) wt slab —
    in-VMEM X-window assembly, the 25 shifted multiply-adds (offset-group
    grid dim keeps the chunk inside VMEM at any H), boundary extraction.
    Returns the per-patch partials (interior, boundary lines, corners)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, P, Pp, E, n_edges, n_verts, n = meta
    CP = 128
    n_chunks = Pp // CP
    dt = xi.dtype
    KB = max(1, min(K, int(3.0e6 / (H * H * CP * 4))))
    n_kb = -(-K // KB)
    wt_pad = wt if n_kb * KB == K else jnp.concatenate(
        [wt, jnp.zeros((n_kb * KB - K, H, H, Pp), wt.dtype)], axis=0)

    def kernel(wt_ref, xi_ref, ln_ref, cv_ref, yi_ref, yl_ref, yc_ref):
        kb = pl.program_id(1)

        def body(X):
            X[...] = jnp.zeros((H + 4, H + 4, CP), dt)
            X[3:1 + H, 3:1 + H] = xi_ref[...]
            X[3:1 + H, 2] = ln_ref[:, 0]
            X[2 + H - 1, 3:1 + H] = ln_ref[:, 1]
            X[3:1 + H, 2 + H - 1] = ln_ref[:, 2]
            X[2, 3:1 + H] = ln_ref[:, 3]
            X[2, 2] = cv_ref[0]
            X[2 + H - 1, 2] = cv_ref[1]
            X[2 + H - 1, 2 + H - 1] = cv_ref[2]
            X[2, 2 + H - 1] = cv_ref[3]
            Y = None
            for q in range(KB):
                # offset k = 5a + b with slice starts a, b in [0, 4]
                # (OFFSETS is the row-major (di, dj) grid over [-2, 2]^2);
                # padded tail entries read zero weights, slice clamped
                k = jnp.minimum(kb * KB + q, K - 1)
                a, b = k // 5, k % 5
                term = wt_ref[q] * X[pl.ds(a, H), pl.ds(b, H)]
                Y = term if Y is None else Y + term

            @pl.when(kb == 0)
            def _():
                yi_ref[...] = jnp.zeros((E, E, CP), dt)
                yl_ref[...] = jnp.zeros((E, 4, CP), dt)
                yc_ref[...] = jnp.zeros((4, CP), dt)

            yi_ref[...] += Y[1:H - 1, 1:H - 1]
            yl_ref[...] += jnp.stack(
                [Y[1:H - 1, 0], Y[H - 1, 1:H - 1],
                 Y[1:H - 1, H - 1], Y[0, 1:H - 1]], axis=1)
            yc_ref[...] += jnp.stack(
                [Y[0, 0], Y[H - 1, 0], Y[H - 1, H - 1], Y[0, H - 1]])

        pl.run_scoped(body, X=pltpu.VMEM((H + 4, H + 4, CP), dt))

    return pl.pallas_call(
        kernel,
        grid=(n_chunks, n_kb),
        in_specs=[
            pl.BlockSpec((KB, H, H, CP), lambda i, kb: (kb, 0, 0, i)),
            pl.BlockSpec((E, E, CP), lambda i, kb: (0, 0, i)),
            pl.BlockSpec((E, 4, CP), lambda i, kb: (0, 0, i)),
            pl.BlockSpec((4, CP), lambda i, kb: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((E, E, CP), lambda i, kb: (0, 0, i)),
            pl.BlockSpec((E, 4, CP), lambda i, kb: (0, 0, i)),
            pl.BlockSpec((4, CP), lambda i, kb: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E, E, Pp), dt),
            jax.ShapeDtypeStruct((E, 4, Pp), dt),
            jax.ShapeDtypeStruct((4, Pp), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(wt_pad, xi, lines, cv)


def _patch_combine(meta, G_edge, M_vs, yi, yl, yc):
    """Per-patch partials -> global vector (same algebra as _collect)."""
    H, P, Pp, E, n_edges, n_verts, n = meta
    dt = yi.dtype
    n_int = E * E * P
    y_int = yi[:, :, :P].reshape(n_int)
    lf = yl[:, :, :P].reshape(E, 4 * P)
    lfl = jnp.concatenate([lf, lf[::-1, :]], axis=1)
    y_e = lfl @ G_edge.astype(dt)
    y_v = M_vs.astype(dt) @ yc[:, :P].reshape(-1)
    return jnp.concatenate([y_int, y_e.reshape(-1), y_v])


def spmv_patch_pallas(op: PatchStencilOp, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x with the patch-chunked fused kernel (falls back to the XLA
    path off-TPU)."""
    if jax.default_backend() != "tpu":
        return op._matvec_xla(x)
    yi, yl, yc = _patch_chunk_call(
        op.wt, *_patch_inputs(op.meta, op.G_face, op.M_cs, x), op.meta)
    return _patch_combine(op.meta, op.G_edge, op.M_vs, yi, yl, yc)


def spmv_block_patch_pallas(op: "BlockPatchStencilOp",
                            x: jnp.ndarray) -> jnp.ndarray:
    """Block (nv-variable) fused patch SpMV: one kernel launch per
    (row-var, col-var) stencil pair streaming that pair's wt slab once;
    the x routing is built once per column variable and the per-patch
    partials accumulate before a single skeleton combination per row
    variable."""
    if jax.default_backend() != "tpu":
        return op._matvec_xla(x)
    meta7 = op.meta[:7]
    nb = op.meta[6]
    nv = op.nv
    inputs = [_patch_inputs(meta7, op.G_face, op.M_cs,
                            x[vc * nb:(vc + 1) * nb]) for vc in range(nv)]
    out = []
    for vr in range(nv):
        acc = None
        for vc in range(nv):
            wt_pair = op.wt[(vr * nv + vc) * K:(vr * nv + vc + 1) * K]
            parts = _patch_chunk_call(wt_pair, *inputs[vc], meta7)
            acc = parts if acc is None else tuple(
                a + b for a, b in zip(acc, parts))
        out.append(_patch_combine(meta7, op.G_edge, op.M_vs, *acc))
    return jnp.concatenate(out)


def dirichlet_eliminate_block(op: BlockPatchStencilOp, dir_mask: jnp.ndarray,
                              owner: jnp.ndarray) -> BlockPatchStencilOp:
    """Blockwise symmetric elimination (see dirichlet_eliminate)."""
    H = op.meta[0]
    nb = op.meta[6]
    nv = op.nv
    proto = op._scalar()
    D = [proto._patch_field(dir_mask[v * nb:(v + 1) * nb].astype(op.wt.dtype))
         for v in range(nv)]
    core = [jax.lax.slice(d, (2, 2, 0), (2 + H, 2 + H, d.shape[2])) > 0.5
            for d in D]
    k0 = OFFSETS.index((0, 0))
    new = []
    for vr in range(nv):
        for vc in range(nv):
            for k, (di, dj) in enumerate(OFFSETS):
                shifted = jax.lax.slice(
                    D[vc], (2 + di, 2 + dj, 0),
                    (2 + di + H, 2 + dj + H, D[vc].shape[2])) > 0.5
                w = jnp.where(core[vr] | shifted, 0.0,
                              op.wt[(vr * nv + vc) * K + k])
                if k == k0 and vr == vc:
                    w = jnp.where(core[vr] & owner, 1.0, w)
                new.append(w)
    return BlockPatchStencilOp(jnp.stack(new), op.G_face, op.G_edge,
                               op.M_cs, op.M_vs, op.meta)


def make_block_patch_op(tab: PatchTables, wt: jnp.ndarray,
                        nv: int) -> BlockPatchStencilOp:
    return BlockPatchStencilOp(
        wt, jnp.asarray(tab.G_face), jnp.asarray(tab.G_edge),
        jnp.asarray(tab.M_cs), jnp.asarray(tab.M_vs),
        (tab.H, tab.P, tab.Pp, tab.E, tab.n_edges, tab.n_verts, tab.n, nv))


def dirichlet_eliminate(op: PatchStencilOp, dir_mask: jnp.ndarray,
                        owner: jnp.ndarray) -> PatchStencilOp:
    """Symmetric elimination in stencil form: zero weights whose row OR col
    node is Dirichlet; 1.0 on the center slot of the OWNER copy of each
    Dirichlet row (ELL equivalent: engine.py "Dirichlet" block)."""
    H = op.meta[0]
    D = op._patch_field(dir_mask.astype(op.wt.dtype))
    core = jax.lax.slice(D, (2, 2, 0), (2 + H, 2 + H, D.shape[2])) > 0.5
    k0 = OFFSETS.index((0, 0))
    new = []
    for k, (di, dj) in enumerate(OFFSETS):
        shifted = jax.lax.slice(
            D, (2 + di, 2 + dj, 0), (2 + di + H, 2 + dj + H, D.shape[2])) > 0.5
        w = jnp.where(core | shifted, 0.0, op.wt[k])
        if k == k0:
            w = jnp.where(core & owner, 1.0, w)
        new.append(w)
    return PatchStencilOp(jnp.stack(new), op.G_face, op.G_edge,
                          op.M_cs, op.M_vs, op.meta)


def make_patch_op(tab: PatchTables, wt: jnp.ndarray) -> PatchStencilOp:
    return PatchStencilOp(
        wt, jnp.asarray(tab.G_face), jnp.asarray(tab.G_edge),
        jnp.asarray(tab.M_cs), jnp.asarray(tab.M_vs),
        (tab.H, tab.P, tab.Pp, tab.E, tab.n_edges, tab.n_verts, tab.n))
