"""Batched element assembly engine.

This replaces the reference's per-element assembly callbacks + adept reverse
AD (canonical: AssembleNavierStokes_AD, 03_navier_stokes.hpp:21-438; generic
wrapper Assemble_jacobian.hpp:31) with ONE jitted batched kernel per mesh
level (SURVEY.md §3.3 "TPU translation target"):

  gather element dof slabs  ->  vmapped quadrature contraction of the weak
  form  ->  ``jax.jacfwd`` of the element residual (the AD-tape analogue of
  the reference's per-element adept recording)  ->  deterministic scatter
  into the ELL value array + residual segment-sum.

The weak form is a pure function ``form(ops, u, aux) -> residuals`` where
``ops`` is an :class:`ElemOps` (the analogue of the reference's
Jacobian/JacobianSur pre-evaluation, ElemType.hpp:285-360), ``u`` maps
unknown names to element-local dof vectors, and ``aux`` carries auxiliary
fields (old solutions, coupled fields) and scalars (dt, nu, ...).

Block layout: unknowns are stacked into one global dof vector with static
per-variable offsets — the reference's KKoffset/KKIndex scheme
(LinearEquation.hpp:122-125), kept because it makes field-split trivial.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fe.geom import GEOMS
from ..fe.tabulate import face_trace_nodes, tabulate, tabulate_at
from ..fe.quadrature import gauss
from ..algebra.sparse import EllPattern, SparseOp, op_from_pattern, pattern_from_pairs

GEO_FAMILY = "biquadratic"   # isoparametric geometry representation

# Geometry einsums (coordinate contractions building J / physical points /
# face tangents) run at HIGHEST MXU precision: DEFAULT's reduced-precision
# passes round ABSOLUTE coordinates, and on fine meshes the rounding is
# comparable to the element size — measured on the L4 nsbenc mesh (TPU
# f32), 696 quadrature determinants came out exactly 0 and 18002 negative
# (CPU f32: min |det| 6.8e-7, none negative), poisoning assembly with NaN.
# Solution/basis interpolations keep DEFAULT (O(1)-conditioned data).
_GEOM_PREC = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class Unknown:
    """A scalar unknown field: name + FE family (MultiLevelSolution.AddSolution
    semantics, MultiLevelSolution.hpp:65-85)."""
    name: str
    family: str = "biquadratic"


class ElemOps:
    """Per-element quadrature operations (built inside vmap; all arrays are
    per-element views of static tabulations)."""

    def __init__(self, tabs: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
                 weights: jnp.ndarray, coords: jnp.ndarray, dim: int):
        self.dim = dim
        self._tabs, self._weights, self.coords = tabs, weights, coords
        gphi, gdphi = tabs[GEO_FAMILY]
        sdim = coords.shape[-1]
        # geometric map: J[q, d, x] = dx_x / dxi_d  (d: reference, x: ambient)
        J = jnp.einsum("qnd,nx->qdx", gdphi, coords, precision=_GEOM_PREC)
        self.x = jnp.einsum("qn,nx->qx", gphi, coords,
                            precision=_GEOM_PREC)     # (nq, sdim) physical qp
        self._phi = {f: t[0] for f, t in tabs.items()}
        if sdim == dim:
            detJ = jnp.linalg.det(J)
            invJ = jnp.linalg.inv(J)                  # invJ[q, x, d]
            self.wdet = weights * jnp.abs(detJ)       # (nq,)
            # physical gradients: dphi[q,n,x] = dphi_ref[q,n,d] dxi_d/dx_x
            self._dphi = {f: jnp.einsum("qnd,qxd->qnx", t[1], invJ)
                          for f, t in tabs.items()}
        else:
            # embedded manifold (surface/curve FE, e.g. the reference's
            # Willmore-surface and Conformal apps on *3D.neu meshes): first
            # fundamental form G = J J^T, area element sqrt(det G),
            # tangential gradients G^{-1} J in ambient coordinates
            G = jnp.einsum("qdx,qex->qde", J, J)      # (nq, dim, dim)
            self.wdet = weights * jnp.sqrt(jnp.linalg.det(G))
            GinvJ = jnp.einsum("qde,qex->qdx", jnp.linalg.inv(G), J)
            self._dphi = {f: jnp.einsum("qnd,qdx->qnx", t[1], GinvJ)
                          for f, t in tabs.items()}
            self._jac = J

    def moved(self, disp_nodes: jnp.ndarray) -> "ElemOps":
        """ElemOps on the displaced configuration x = X + d (ALE / moving
        mesh; the reference's type_mov=adouble geometry, ElemType_template
        JacJacInv over adouble coords).  disp_nodes: (nd_geo, dim) built from
        the displacement unknowns, so jacfwd differentiates through the
        geometry."""
        return ElemOps(self._tabs, self._weights, self.coords + disp_nodes,
                       self.dim)

    # ---- raw tabulations (custom forms, e.g. the reference FSI app's
    # no-Jacobian ALE smoothing term, testFSISteady main.cpp:741) ---------
    @property
    def qweights(self) -> jnp.ndarray:
        """Raw quadrature weights (no geometric Jacobian): (nq,)."""
        return self._weights

    def phi(self, fam: str) -> jnp.ndarray:
        """Shape functions at quadrature points: (nq, nd)."""
        return self._phi[fam]

    def dphi(self, fam: str) -> jnp.ndarray:
        """Physical gradients at quadrature points: (nq, nd, dim)."""
        return self._dphi[fam]

    def dphi_ref(self, fam: str) -> jnp.ndarray:
        """Reference-frame derivatives d(phi)/d(xi) at quadrature points:
        (nq, nd, dim_ref) — parametric derivatives for metric-based surface
        forms (the reference Conformal apps' GetDPhiDXi/GetDPhiDEta)."""
        return self._tabs[fam][1]

    # ---- interpolation -------------------------------------------------
    def value(self, fam: str, u: jnp.ndarray) -> jnp.ndarray:
        """u at quadrature points: (nq,)."""
        return self._phi[fam] @ u

    def grad(self, fam: str, u: jnp.ndarray) -> jnp.ndarray:
        """grad u at quadrature points: (nq, dim)."""
        return jnp.einsum("qnx,n->qx", self._dphi[fam], u)

    def pointwise(self, fn: Callable) -> jnp.ndarray:
        """Evaluate a user source/forcing callback written against a flat
        (N, sdim) array of physical points (the layout-agnostic contract —
        the same callback works under both assembly layouts).  Returns
        (nq, ...) here; (nq, ..., ne) in :class:`ElemOpsBatched`."""
        return fn(self.x)

    # ---- test-function integrals --------------------------------------
    def t(self, fam: str, s: jnp.ndarray) -> jnp.ndarray:
        """integral s * phi_i   (s: (nq,)) -> (nd,)."""
        return self._phi[fam].T @ (self.wdet * s)

    def tgrad(self, fam: str, v: jnp.ndarray) -> jnp.ndarray:
        """integral v . grad phi_i   (v: (nq, dim)) -> (nd,)."""
        return jnp.einsum("qnx,qx,q->n", self._dphi[fam], v, self.wdet)

    def tgrad_d(self, fam: str, s: jnp.ndarray, d: int) -> jnp.ndarray:
        """integral s * d(phi_i)/dx_d   (s: (nq,)) -> (nd,)."""
        return jnp.einsum("qn,q,q->n", self._dphi[fam][:, :, d], s, self.wdet)


def _det_inv_batched(J):
    """Determinant and inverse of J[q, a, b, e] over the (a, b) axes for
    dim 1/2/3 — explicit adjugate so the element axis stays last (lane
    axis); jnp.linalg would force a relayout to matrices-last."""
    d = J.shape[1]
    if d == 1:
        det = J[:, 0, 0]
        inv = 1.0 / det[:, None, None]
        return det, inv
    if d == 2:
        det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        row0 = jnp.stack([J[:, 1, 1], -J[:, 0, 1]], axis=1)
        row1 = jnp.stack([-J[:, 1, 0], J[:, 0, 0]], axis=1)
        return det, jnp.stack([row0, row1], axis=1) / det[:, None, None]
    c00 = J[:, 1, 1] * J[:, 2, 2] - J[:, 1, 2] * J[:, 2, 1]
    c01 = J[:, 1, 2] * J[:, 2, 0] - J[:, 1, 0] * J[:, 2, 2]
    c02 = J[:, 1, 0] * J[:, 2, 1] - J[:, 1, 1] * J[:, 2, 0]
    det = J[:, 0, 0] * c00 + J[:, 0, 1] * c01 + J[:, 0, 2] * c02
    c10 = J[:, 0, 2] * J[:, 2, 1] - J[:, 0, 1] * J[:, 2, 2]
    c11 = J[:, 0, 0] * J[:, 2, 2] - J[:, 0, 2] * J[:, 2, 0]
    c12 = J[:, 0, 1] * J[:, 2, 0] - J[:, 0, 0] * J[:, 2, 1]
    c20 = J[:, 0, 1] * J[:, 1, 2] - J[:, 0, 2] * J[:, 1, 1]
    c21 = J[:, 0, 2] * J[:, 1, 0] - J[:, 0, 0] * J[:, 1, 2]
    c22 = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
    adjT = jnp.stack([jnp.stack([c00, c10, c20], axis=1),
                      jnp.stack([c01, c11, c21], axis=1),
                      jnp.stack([c02, c12, c22], axis=1)], axis=1)
    return det, adjT / det[:, None, None]


class ElemOpsBatched:
    """All-elements ElemOps with the element axis LAST (TPU lane axis).

    Same method surface as :class:`ElemOps`, but every interpolation /
    integration is one big einsum contracting over dofs or quadrature with
    the full element batch on the minor axis — MXU matmuls instead of
    (ne,)-leading batched tiny ops.  Measured on a 512^2 Q2 nonlinear
    assembly: 64x faster than the batch-first layout (22 ms vs 1.4 s on
    v5e).  Scalars at quadrature points are (nq, ne); element-local dof
    vectors are (nd, ne); ``aux['group']`` is (ne,) and broadcasts
    correctly against (nq, ne).
    """

    def __init__(self, tabs, weights, coords, dim):
        # coords: (nd_geo, sdim, ne)
        self.dim = dim
        self._tabs, self._weights, self.coords = tabs, weights, coords
        gphi, gdphi = tabs[GEO_FAMILY]
        sdim = coords.shape[1]
        # center per element before the MXU contraction: sum_n dphi = 0, so
        # subtracting the element mean leaves J exact while shrinking the
        # contraction operands from absolute-coordinate to element-size
        # scale — the reduced-precision passes then carry ~h * 1e-6
        # absolute error instead of |x| * 1e-6 (which reached the element
        # size on fine meshes); combined with _GEOM_PREC this keeps dets
        # sign-accurate at any refinement depth
        cmean = coords.mean(axis=0, keepdims=True)
        J = jnp.einsum("qnd,nxe->qdxe", gdphi, coords - cmean,
                       precision=_GEOM_PREC)
        self.x = jnp.einsum("qn,nxe->qxe", gphi, coords,
                            precision=_GEOM_PREC)      # (nq, sdim, ne)
        self._phi = {f: t[0] for f, t in tabs.items()}
        if sdim == dim:
            detJ, invJ = _det_inv_batched(J)               # invJ[q, x, d, e]
            self.wdet = weights[:, None] * jnp.abs(detJ)   # (nq, ne)
            self._dphi = {f: jnp.einsum("qnd,qxde->qnxe", t[1], invJ)
                          for f, t in tabs.items()}
        else:
            G = jnp.einsum("qdxe,qbxe->qdbe", J, J)
            detG, invG = _det_inv_batched(G)
            self.wdet = weights[:, None] * jnp.sqrt(detG)
            GinvJ = jnp.einsum("qdbe,qbxe->qdxe", invG, J)
            self._dphi = {f: jnp.einsum("qnd,qdxe->qnxe", t[1], GinvJ)
                          for f, t in tabs.items()}
            self._jac = J

    def moved(self, disp_nodes: jnp.ndarray) -> "ElemOpsBatched":
        return ElemOpsBatched(self._tabs, self._weights,
                              self.coords + disp_nodes, self.dim)

    @property
    def qweights(self) -> jnp.ndarray:
        return self._weights

    def phi(self, fam: str) -> jnp.ndarray:
        return self._phi[fam]

    def dphi(self, fam: str) -> jnp.ndarray:
        """Physical gradients: (nq, nd, dim, ne)."""
        return self._dphi[fam]

    def dphi_ref(self, fam: str) -> jnp.ndarray:
        return self._tabs[fam][1]

    def value(self, fam: str, u: jnp.ndarray) -> jnp.ndarray:
        """u: (nd, ne) -> (nq, ne)."""
        return jnp.einsum("qn,ne->qe", self._phi[fam], u)

    def grad(self, fam: str, u: jnp.ndarray) -> jnp.ndarray:
        """u: (nd, ne) -> (nq, dim, ne)."""
        return jnp.einsum("qnxe,ne->qxe", self._dphi[fam], u)

    def pointwise(self, fn: Callable) -> jnp.ndarray:
        """Flatten (nq, sdim, ne) quad points to (nq*ne, sdim), call the
        user callback (written once against flat points — works under both
        layouts), and restore the element axis LAST: (nq, ..., ne)."""
        nq, sdim, ne = self.x.shape
        flat = jnp.transpose(self.x, (0, 2, 1)).reshape(nq * ne, sdim)
        out = fn(flat)
        out = out.reshape((nq, ne) + out.shape[1:])
        return jnp.moveaxis(out, 1, -1)

    def t(self, fam: str, s: jnp.ndarray) -> jnp.ndarray:
        """s: (nq, ne) -> (nd, ne)."""
        return jnp.einsum("qn,qe->ne", self._phi[fam], self.wdet * s)

    def tgrad(self, fam: str, v: jnp.ndarray) -> jnp.ndarray:
        """v: (nq, dim, ne) -> (nd, ne)."""
        return jnp.einsum("qnxe,qxe->ne", self._dphi[fam], v * self.wdet[:, None])

    def tgrad_d(self, fam: str, s: jnp.ndarray, d: int) -> jnp.ndarray:
        return jnp.einsum("qne,qe->ne", self._dphi[fam][:, :, d],
                          s * self.wdet)


class FaceOps:
    """Per-boundary-face quadrature operations (surface integrals; analogue of
    the reference's JacobianSur, ElemType.hpp:330-360)."""

    def __init__(self, tabs, weights, coords, dim, sign):
        gphi, gdphi = tabs[GEO_FAMILY]
        self.x = jnp.einsum("qn,nx->qx", gphi, coords,
                            precision=_GEOM_PREC)         # (nq, dim)
        # tangents: (nq, dim_f, dim)
        T = jnp.einsum("qnd,nx->qdx", gdphi, coords, precision=_GEOM_PREC)
        if dim == 2:
            t = T[:, 0, :]                                # (nq, 2)
            ds = jnp.linalg.norm(t, axis=-1)
            n = jnp.stack([t[:, 1], -t[:, 0]], axis=-1) / ds[:, None]
        elif dim == 3:
            cr = jnp.cross(T[:, 0, :], T[:, 1, :])
            ds = jnp.linalg.norm(cr, axis=-1)
            n = cr / ds[:, None]
        else:
            ds = jnp.ones(weights.shape)
            n = jnp.ones((weights.shape[0], 1))
        self.normal = n * sign
        self.wds = weights * ds
        self._phi = {f: t[0] for f, t in tabs.items()}

    def value(self, fam, u):
        return self._phi[fam] @ u

    def t(self, fam, s):
        """integral_face s * phi_i ds."""
        return self._phi[fam].T @ (self.wds * s)


class VolumeFaceOps:
    """Face quadrature with the owning ELEMENT's trial space: values,
    physical gradients and normal derivatives of volume basis functions on
    a boundary face (Nitsche, DG-type terms). Geometry (normal, surface
    measure) comes from the face trace like FaceOps; trial data from the
    volume tabulation at the face quadrature points."""

    def __init__(self, vtabs, ftabs, weights, ecoords, fcoords, dim, sign):
        # face geometry: normal + ds (same as FaceOps)
        gphi, gdphi = ftabs[GEO_FAMILY]
        self.x = jnp.einsum("qn,nx->qx", gphi, fcoords,
                            precision=_GEOM_PREC)
        T = jnp.einsum("qnd,nx->qdx", gdphi, fcoords, precision=_GEOM_PREC)
        if dim == 2:
            t = T[:, 0, :]
            ds = jnp.linalg.norm(t, axis=-1)
            n = jnp.stack([t[:, 1], -t[:, 0]], axis=-1) / ds[:, None]
        elif dim == 3:
            cr = jnp.cross(T[:, 0, :], T[:, 1, :])
            ds = jnp.linalg.norm(cr, axis=-1)
            n = cr / ds[:, None]
        else:
            ds = jnp.ones(weights.shape)
            n = jnp.ones((weights.shape[0], 1))
        self.normal = n * sign
        self.wds = weights * ds
        # volume trial space at the face qps
        self._vtabs = vtabs
        vgphi, vgdphi = vtabs[GEO_FAMILY]
        Jv = jnp.einsum("qnd,nx->qxd", vgdphi, ecoords,
                        precision=_GEOM_PREC)             # (nq, dim, dim)
        self._invJ = jnp.linalg.inv(Jv)
        # characteristic face size for penalty scaling: measure^(1/(dim-1))
        measure = self.wds.sum()
        self.h = measure if dim <= 2 else jnp.sqrt(measure)

    def value(self, fam, ue):
        return self._vtabs[fam][0] @ ue

    def grad(self, fam, ue):
        dphi = jnp.einsum("qnd,qxd->qnx", self._vtabs[fam][1], self._invJ)
        return jnp.einsum("qnx,n->qx", dphi, ue)

    def dn(self, fam, ue):
        """normal derivative du/dn at the face qps."""
        return jnp.einsum("qx,qx->q", self.grad(fam, ue), self.normal)

    def t(self, fam, s):
        """integral s * phi_i ds over element-local dofs."""
        return self._vtabs[fam][0].T @ (self.wds * s)

    def tn(self, fam, s):
        """integral s * dphi_i/dn ds (symmetrizing Nitsche term)."""
        dphi = jnp.einsum("qnd,qxd->qnx", self._vtabs[fam][1], self._invJ)
        dn = jnp.einsum("qnx,qx->qn", dphi, self.normal)
        return dn.T @ (self.wds * s)


class Assembler:
    """Assembles residual + Jacobian for a set of unknowns on one mesh level."""

    def __init__(self, mesh, unknowns: Sequence[Unknown], quad_order="fifth",
                 dtype=None, pad_dofs_to: int = 1, pad_elems_to: int = 1,
                 interleave: bool = False):
        """pad_dofs_to / pad_elems_to: round row and element counts up to a
        multiple (device-mesh axis size) — padding rows become identity
        (Dirichlet-style) and padding elements scatter out-of-bounds with
        mode='drop', so sharded shapes stay divisible without affecting the
        algebra.

        interleave=True replaces the slab-major stacked layout with a
        NODE-MAJOR one: the physical position of logical dof (var k, idx i)
        follows the mesh entity it lives on (node for Lagrange families,
        owning element's last node for element-wise families), so coupled
        variables of one node sit adjacent and the assembled pattern is
        banded when the mesh numbering is (e.g. RCM) local — the layout the
        blocked-ELL fast path wants, with NO per-matvec permutes.  The
        KKoffset block offsets stay the LOGICAL interface: callers keep
        addressing per-variable slices and ``set_dirichlet`` keeps taking
        logical arrays; ``stack_perm`` (logical -> physical) is applied
        once at the edofs/mask funnels (VERDICT r3: "a permutation layer
        at assembly time keeps offsets logical")."""
        self.mesh = mesh
        self.unknowns = list(unknowns)
        self.dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        g = GEOMS[mesh.geom]
        self.dim = mesh.dim
        # ---- block layout (KKoffset analogue) --------------------------
        self.dofmaps = {u.name: mesh.dofmap(u.family) for u in unknowns}
        self.offsets: Dict[str, int] = {}
        off = 0
        for u in unknowns:
            self.offsets[u.name] = off
            off += self.dofmaps[u.name].n_dofs
        self.n_dofs = off
        # element dof gather table: (ne, ndt)
        parts = []
        self.local_slices: Dict[str, slice] = {}
        loc = 0
        for u in unknowns:
            dm = self.dofmaps[u.name]
            parts.append(dm.conn + self.offsets[u.name])
            self.local_slices[u.name] = slice(loc, loc + dm.conn.shape[1])
            loc += dm.conn.shape[1]
        self.ndt = loc
        self.edofs = np.concatenate(parts, axis=1).astype(np.int32)
        # node-major interleave: permute the stacked index space ONCE here —
        # every downstream structure (pattern, slots, scatter rows, Vanka
        # blocks, BELL plans) inherits the physical layout automatically
        self.stack_perm = None
        if interleave and len(unknowns) > 1:
            keys = np.empty(self.n_dofs, np.int64)
            for u in unknowns:
                dm = self.dofmaps[u.name]
                off = self.offsets[u.name]
                nodes = np.asarray(dm.nodes)
                if (nodes >= 0).all():
                    keys[off:off + dm.n_dofs] = 2 * nodes.astype(np.int64)
                else:
                    # element-wise dofs anchor after their element's last node
                    npp = dm.n_dofs // mesh.n_elems
                    anchor = mesh.conn.max(axis=1).astype(np.int64)
                    keys[off:off + dm.n_dofs] =                         2 * np.repeat(anchor, npp) + 1
            order = np.argsort(keys, kind="stable")   # logical, phys-ordered
            sp_ = np.empty(self.n_dofs, np.int64)
            sp_[order] = np.arange(self.n_dofs)
            self.stack_perm = sp_.astype(np.int32)
            self.edofs = self.stack_perm[self.edofs]
        # ---- sparsity pattern + ELL slots ------------------------------
        ne = mesh.n_elems
        def _round_up(x, m):
            return -(-x // m) * m
        self.n_dofs_pad = _round_up(self.n_dofs, pad_dofs_to)
        self.ne_pad = _round_up(ne, pad_elems_to)
        rows = np.repeat(self.edofs, self.ndt, axis=1).ravel()
        cols = np.tile(self.edofs, (1, self.ndt)).ravel()
        self.pattern = pattern_from_pairs(rows, cols, self.n_dofs, self.n_dofs)
        if self.n_dofs_pad != self.n_dofs:
            from ..algebra.sparse import pad_pattern
            self.pattern = pad_pattern(self.pattern, self.n_dofs_pad, self.n_dofs_pad)
        # slot of each (e, i, j): ELL flat position
        lut = _build_slot_lut(self.pattern)
        self.slots = lut(rows, cols).reshape(ne, self.ndt, self.ndt)
        if self.ne_pad != ne:
            # padding elements: gather from dof 0 (valid), scatter out of
            # bounds (dropped)
            pad = self.ne_pad - ne
            self.edofs = np.vstack([self.edofs,
                                    np.zeros((pad, self.ndt), np.int32)])
            oob = self.pattern.n_rows * self.pattern.width
            self.slots = np.concatenate(
                [self.slots, np.full((pad, self.ndt, self.ndt), oob, np.int64)])
            self._scatter_rows = np.vstack(
                [self.edofs[:ne],
                 np.full((pad, self.ndt), self.n_dofs_pad, np.int32)])
        else:
            self._scatter_rows = self.edofs
        # ---- tabulations ------------------------------------------------
        self.quad_order = quad_order
        fams = {GEO_FAMILY} | {u.family for u in unknowns}
        pts, w = gauss(mesh.geom, quad_order)
        self.tabs = {f: (jnp.asarray(tabulate(mesh.geom, f, quad_order).phi, self.dtype),
                         jnp.asarray(tabulate(mesh.geom, f, quad_order).dphi, self.dtype))
                     for f in fams}
        self.qweights = jnp.asarray(w, self.dtype)
        self.geo_conn = mesh.conn[:, g.family_nodes[GEO_FAMILY]]
        coords_e = mesh.coords[self.geo_conn]
        if self.ne_pad != mesh.n_elems:
            pad = self.ne_pad - mesh.n_elems
            coords_e = np.concatenate([coords_e,
                                       np.repeat(coords_e[:1], pad, axis=0)])
        self.coords_e = jnp.asarray(coords_e, self.dtype)
        # ---- Dirichlet bookkeeping (set by systems layer) ---------------
        self.dirichlet_mask = np.zeros(self.n_dofs_pad, bool)
        self.dirichlet_mask[self.n_dofs:] = True   # padding rows = identity
        # ---- forms -------------------------------------------------------
        self.volume_form: Optional[Callable] = None
        self.face_form: Optional[Callable] = None
        self.particle_form: Optional[Callable] = None
        self.particle_payload_names: Tuple[str, ...] = ()
        self.aux_field_specs: List[Tuple[str, str]] = []   # (name, family)
        self._faces_built = False
        # alternate matrix layout (patch stencil; algebra/patchstencil.py)
        self.patch_tab = None
        self._patch_slots = None
        self._patch_size = None

    def set_patch_layout(self, plan) -> None:
        """Assemble the Jacobian into the PATCH-STENCIL layout instead of
        ELL (mesh must come from mesh.patches.refine_patched; single
        biquadratic unknown).  ``op_with`` then returns a PatchStencilOp
        with symmetric Dirichlet elimination applied in stencil form."""
        assert all(u.family == "biquadratic" for u in self.unknowns), \
            "patch layout: biquadratic unknowns only"
        nv = len(self.unknowns)
        from ..mesh.patches3d import PatchPlan3D
        if isinstance(plan, PatchPlan3D):
            assert nv == 1, "3-D patch layout: single unknown (so far)"
            from ..algebra.patchstencil3d import (build_patch_slots_3d,
                                                  build_patch_tables_3d)
            tab = build_patch_tables_3d(plan)
            assert tab.n == self.n_dofs, (tab.n, self.n_dofs)
            slots, size = build_patch_slots_3d(plan, tab)
        else:
            from ..algebra.patchstencil import (build_patch_slots,
                                                build_patch_tables)
            tab = build_patch_tables(plan)
            assert tab.n * nv == self.n_dofs, (tab.n, nv, self.n_dofs)
            slots, size = build_patch_slots(plan, tab, nv=nv)
        self._patch_nv = nv
        if self.ne_pad != slots.shape[0]:
            pad = self.ne_pad - slots.shape[0]
            slots = np.concatenate(
                [slots, np.full((pad,) + slots.shape[1:], size, np.int64)])
        self.patch_tab = tab
        self._patch_slots = slots
        self._patch_size = size
        self._tables_cache = None

    # ------------------------------------------------------------------
    def set_dirichlet(self, mask: np.ndarray, values: Optional[np.ndarray] = None) -> None:
        """Install Dirichlet mask/values (sized n_dofs, LOGICAL offsets
        layout), preserving padding rows.  With an interleaved stacked
        layout the arrays are permuted into the physical frame here."""
        m = np.zeros(self.n_dofs_pad, bool)
        v = np.zeros(self.n_dofs_pad)
        if self.stack_perm is not None:
            m[self.stack_perm] = mask[:self.n_dofs]
            if values is not None:
                v[self.stack_perm] = values[:self.n_dofs]
        else:
            m[:self.n_dofs] = mask[:self.n_dofs]
            if values is not None:
                v[:self.n_dofs] = values[:self.n_dofs]
        m[self.n_dofs:] = True
        self.dirichlet_mask = m
        self.dirichlet_values = v
        self._tables_cache = None

    def set_volume_form(self, fn: Callable) -> None:
        """fn(ops: ElemOps, u: dict, aux: dict) -> dict name -> (nd,).

        A form that is written against per-element semantics only (direct
        ``ops.coords``/axis manipulation that does not broadcast over the
        trailing element axis) can set ``fn.layout = "batch_first"`` to opt
        out of the batched element-last fast path."""
        self.volume_form = fn

    def set_face_form(self, fn: Callable, volume: bool = False) -> None:
        """fn(fops: FaceOps, u: dict, group: int scalar, aux: dict) -> dict.

        volume=True: the form needs the owning ELEMENT's trial space on the
        face (normal derivatives, Nitsche/DG terms): u carries full
        element-local dof vectors, fops is a VolumeFaceOps, and residuals are
        per element-local dof (reference boundary loops that call the volume
        ``JacobianSur``, 03_navier_stokes.hpp:193-301)."""
        self.face_form = fn
        self.face_form_volume = volume
        self._build_face_tables()

    def add_aux_field(self, name: str, family: str) -> None:
        """Auxiliary field gathered like an unknown (old solution, coupling)."""
        self.aux_field_specs.append((name, family))

    def set_particle_form(self, fn: Callable,
                          payload_names: Sequence[str]) -> None:
        """Residual contribution of material points to their owner element.

        fn(u: dict name -> (nd,) element-local dofs, p: dict payload-name ->
        per-particle arrays, aux: dict scalars) -> dict name -> (nd,).

        This is the monolithic MPM-FSI coupling hook: the reference adds
        solid-particle stress/inertia terms to the background-grid momentum
        rows inside the assembly loop (applications/MPM_FSI; grid transfer
        Line.hpp:81-87).  Particle terms couple only the owner element's
        dofs, so the Jacobian lands in the existing element ELL slots.
        Particle data is regrouped per call via :meth:`particle_tables` and
        supplied as ``tables['particles']``.
        """
        self.particle_form = fn
        self.particle_payload_names = tuple(payload_names)

    def gather_plan(self) -> dict:
        """Invert the element->slot scatter into a slot->sources gather.

        TPU scatter-add throughput is far below gather throughput, and the
        assembly scatter (ne * ndt^2 Jacobian entries + ne * ndt residual
        entries) dominates a Newton step on-device.  Since the sparsity is
        static, the inverse map is precomputable: every ELL slot receives
        contributions from a small bounded set of (element, i, j) entries
        (<= element valence), so

            data.ravel()[s] = sum_k jac.ravel()[slot_src[s, k]]

        is a dense gather + reduction — no scatter at all, deterministic
        summation order.  Pass the returned dict as ``tables['gather']``
        (device_tables(gather=True) does this).  Memory: O(nnz * max_mult)
        int32 — intended for the TPU hot path, not tiny CPU tests."""
        def invert(targets_flat, n_targets, oob):
            src = np.where(targets_flat < oob)[0]
            tgt = targets_flat[src]
            order = np.argsort(tgt, kind="stable")
            src, tgt = src[order], tgt[order]
            counts = np.bincount(tgt, minlength=n_targets)
            mult = int(counts.max()) if len(counts) else 1
            table = np.full((n_targets, mult), len(targets_flat), np.int64)
            pos = np.zeros(n_targets, np.int64)
            k = np.arange(len(tgt)) - np.concatenate(
                [[0], np.cumsum(counts)[:-1]])[tgt]
            table[tgt, k] = src
            return table.astype(np.int32), mult

        if self.patch_tab is not None:
            slot_src, _ = invert(self._patch_slots.ravel(),
                                 self._patch_size, self._patch_size)
        else:
            n_slots = self.pattern.n_rows * self.pattern.width
            slot_src, _ = invert(self.slots.ravel(), n_slots, n_slots)
        row_src, _ = invert(self._scatter_rows.ravel().astype(np.int64),
                            self.n_dofs_pad, self.n_dofs_pad)
        return {"slot_src": jnp.asarray(slot_src),
                "row_src": jnp.asarray(row_src)}

    def particle_tables(self, elems: np.ndarray, payload: Dict[str, jnp.ndarray],
                        ppe: int) -> dict:
        """Group particles by owner element (host) into fixed (ne, ppe) slots.

        elems: (np_,) owner element per particle (−1 = inactive).  payload:
        per-particle arrays (np_, ...), gathered on device into
        (ne_pad, ppe, ...).  Raises if any element holds more than ``ppe``
        particles (static capacity — resize and re-jit, the AMR rule)."""
        elems = np.asarray(elems)
        idx = np.zeros((self.ne_pad, ppe), np.int32)
        mask = np.zeros((self.ne_pad, ppe), bool)
        fill = np.zeros(self.ne_pad, np.int32)
        order = np.argsort(elems, kind="stable")
        for i in order:
            e = elems[i]
            if e < 0:
                continue
            if fill[e] >= ppe:
                raise ValueError(
                    f"element {e} holds more than ppe={ppe} particles")
            idx[e, fill[e]] = i
            mask[e, fill[e]] = True
            fill[e] += 1
        gidx = jnp.asarray(idx)
        return {
            "mask": jnp.asarray(mask),
            "payload": {k: jnp.asarray(v)[gidx]
                        for k, v in payload.items()},
        }

    # ------------------------------------------------------------------
    def _split(self, u_flat: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {u.name: u_flat[self.local_slices[u.name]] for u in self.unknowns}

    def _elem_residual(self, tabs, qweights, u_flat, coords, aux_loc, aux_scalars):
        ops = ElemOps(tabs, qweights, coords, self.dim)
        u = self._split(u_flat)
        aux = dict(aux_scalars)
        aux.update(aux_loc)
        out = self.volume_form(ops, u, aux)
        return jnp.concatenate([out[u.name] for u in self.unknowns])

    # ------------------------------------------------------------------
    def _build_face_tables(self) -> None:
        """Precompute per-boundary-face gather tables and tabulations."""
        if self._faces_built:
            return
        self._faces_built = True
        self.face_batches = []
        mesh = self.mesh
        g = GEOMS[mesh.geom]
        for fg, bf in mesh.boundary.items():
            nfaces = len(bf.elem)
            if nfaces == 0:
                continue
            # trace node tables depend on iface; group faces by iface
            for iface in np.unique(bf.iface):
                sel = np.where(bf.iface == iface)[0]
                fams = {}
                fdof_parts = []
                fslices = {}
                loc0 = 0
                for u in self.unknowns:
                    ff, lidx = face_trace_nodes(mesh.geom, u.family, int(iface))
                    fams[u.name] = ff
                    # element-local positions -> global dofs
                    sl = self.local_slices[u.name]
                    edo = self.edofs[bf.elem[sel]][:, sl][:, lidx]
                    fdof_parts.append(edo)
                    fslices[u.name] = slice(loc0, loc0 + len(lidx))
                    loc0 += len(lidx)
                fdofs = np.concatenate(fdof_parts, axis=1).astype(np.int32)
                # geometry coords of the face (biquadratic trace)
                gff, glidx = face_trace_nodes(mesh.geom, GEO_FAMILY, int(iface))
                fcoords = mesh.coords[self.geo_conn[bf.elem[sel]][:, glidx]]
                # tabulations on the face geometry
                pts, w = gauss(fg, self.quad_order)
                tabs = {}
                used_fams = {gff} | set(fams.values())
                for fam in used_fams:
                    t = tabulate(fg, fam, self.quad_order)
                    tabs[fam] = (jnp.asarray(t.phi, self.dtype),
                                 jnp.asarray(t.dphi, self.dtype))
                tabs[GEO_FAMILY] = tabs[gff]
                batch = dict(
                    fgeom=fg, iface=int(iface),
                    fdofs=fdofs,
                    fslices=fslices, fams=fams, ndf=loc0,
                    coords=jnp.asarray(fcoords, self.dtype),
                    groups=jnp.asarray(bf.group[sel], jnp.int32),
                    tabs=tabs, weights=jnp.asarray(w, self.dtype),
                )
                if getattr(self, "face_form_volume", False):
                    # volume trial space at the face quadrature points:
                    # face-ref -> volume-ref via the face's bq ref nodes
                    from ..fe.basis import get_basis
                    fgeo, f_bq = g.faces[int(iface)]
                    fb = get_basis(fgeo, GEO_FAMILY)
                    xi_vol = np.asarray(fb.eval(pts)) @ np.asarray(
                        g.ref_nodes[np.asarray(f_bq)])
                    vtabs = {}
                    vol_fams = {u.family for u in self.unknowns} | {GEO_FAMILY}
                    for fam in vol_fams:
                        vb = get_basis(mesh.geom, fam)
                        vtabs[fam] = (
                            jnp.asarray(np.asarray(vb.eval(xi_vol)), self.dtype),
                            jnp.asarray(np.asarray(vb.eval_grad(xi_vol)),
                                        self.dtype))
                    batch["vtabs"] = vtabs
                    batch["eidx"] = self.edofs[bf.elem[sel]]
                    batch["ecoords"] = self.coords_e[np.asarray(bf.elem[sel])]
                self.face_batches.append(batch)

    def _face_residual(self, batch, tabs, weights, u_flat, coords, grp, aux_scalars):
        fops = FaceOps(tabs, weights, coords, self.dim, 1.0)
        u = {name: u_flat[batch["fslices"][name]] for name in batch["fslices"]}
        fams = batch["fams"]
        out = self.face_form(fops, u, fams, grp, dict(aux_scalars))
        parts = []
        for un in self.unknowns:
            r = out.get(un.name)
            if r is None:
                n = batch["fslices"][un.name]
                r = jnp.zeros(n.stop - n.start, self.dtype)
            parts.append(r)
        return jnp.concatenate(parts)

    # ------------------------------------------------------------------
    def device_tables_cached(self) -> dict:
        """device_tables() with caching; invalidated by set_dirichlet."""
        if getattr(self, "_tables_cache", None) is None:
            self._tables_cache = self.device_tables()
        return self._tables_cache

    def device_tables(self) -> dict:
        """All large arrays the assembly kernel reads, as one pytree.

        Passing this as a jit ARGUMENT (rather than closing over it) keeps
        multi-MB index/coordinate tables out of the compiled HLO as inlined
        constants — which matters enormously for TPU compile time — and lets
        Dirichlet masks / coordinates update without recompilation.
        """
        eg = self.mesh.elem_group
        if self.ne_pad != len(eg):
            eg = np.concatenate([eg, np.zeros(self.ne_pad - len(eg), eg.dtype)])
        t = {
            "elem_group": jnp.asarray(eg),
            "edofs": jnp.asarray(self.edofs),
            "scatter_rows": jnp.asarray(self._scatter_rows),
            "slots": jnp.asarray(self.slots.reshape(-1)),
            "patch_slots": (jnp.asarray(self._patch_slots.reshape(-1))
                            if self._patch_slots is not None else None),
            "patch_owner": (jnp.asarray(self.patch_tab.owner)
                            if self.patch_tab is not None else None),
            "coords_e": self.coords_e,
            "dir_mask": jnp.asarray(self.dirichlet_mask),
            "ell_cols": jnp.asarray(self.pattern.cols),
            "ell_valid": jnp.asarray(self.pattern.valid),
            "tabs": self.tabs,
            "qweights": self.qweights,
            "aux_conn": {},
            "faces": [],
            "particles": None,
            # patch layout: always ship the inverse (gather) plan — the
            # direct .at[].add scatter into the stencil array compiles
            # pathologically on XLA:TPU (measured: >19 min vs 16 s)
            "gather": self.gather_plan() if self.patch_tab is not None else None,
        }
        for name, fam in self.aux_field_specs:
            conn = self.mesh.dofmap(fam).conn
            if self.ne_pad != conn.shape[0]:
                conn = np.vstack([conn, np.zeros(
                    (self.ne_pad - conn.shape[0], conn.shape[1]), conn.dtype)])
            t["aux_conn"][name] = jnp.asarray(conn)
        if self.face_form is not None:
            for b in self.face_batches:
                ft = {
                    "fdofs": jnp.asarray(b["fdofs"]),
                    "coords": b["coords"],
                    "groups": b["groups"],
                    "weights": b["weights"],
                    "tabs": b["tabs"],
                    "slots": jnp.asarray(self._face_slots(b).reshape(-1)),
                }
                if getattr(self, "face_form_volume", False):
                    ft["eidx"] = jnp.asarray(b["eidx"])
                    ft["ecoords"] = b["ecoords"]
                t["faces"].append(ft)
        return t

    def make_assemble_fn(self, with_jacobian: bool = True,
                         pass_tables: bool = False,
                         layout: str = "element_last"):
        """Return a jittable assembly function.

        pass_tables=False: (u, aux_fields, aux_scalars) -> (R, data) with all
        tables closed over (fine on CPU; convenient for tests).
        pass_tables=True: (u, tables, aux_fields, aux_scalars) -> (R, data)
        with tables supplied per call — the TPU-friendly form.

        layout="element_last" (the default, and the hot path everywhere —
        systems layer, sharded step, driver entry): the volume form runs
        ONCE over all elements through :class:`ElemOpsBatched` (element axis
        on the lane dimension; interpolation/integration become MXU
        matmuls), and the Jacobian comes from ``jax.linearize`` + ndt basis
        tangents (exact, because element residuals are local).  Measured
        60x+ faster per assembly than batch_first on TPU.  Forms must be
        written against the ops API (all the in-tree forms are);
        face/particle contributions still use the per-element path.
        layout="batch_first" (vmap of per-element residual + jacfwd) is the
        fallback for forms that index the element axis directly.
        """
        nrows, w = self.pattern.n_rows, self.pattern.width
        row_ids = jnp.arange(nrows)[:, None]
        const_tables = None if pass_tables else self.device_tables()
        layout = getattr(self.volume_form, "layout", layout)
        assert self.patch_tab is None or (
            self.face_form is None and self.particle_form is None), \
            "patch matrix layout: face/particle Jacobians not supported"

        def assemble_t(u, tables, aux_fields=None, aux_scalars=None):
            aux_fields = aux_fields or {}
            aux_scalars = aux_scalars or {}
            u = u.astype(self.dtype)
            u_loc = u[tables["edofs"]]                      # (ne, ndt)
            aux_loc = {name: aux_fields[name][tables["aux_conn"][name]]
                       for name, _ in self.aux_field_specs}
            tabs, qw = tables["tabs"], tables["qweights"]

            def one(ul, cl, grp, *aux_vals):
                al = dict(zip([n for n, _ in self.aux_field_specs], aux_vals))
                al["group"] = grp
                return self._elem_residual(tabs, qw, ul, cl, al, aux_scalars)

            aux_arrays = [aux_loc[n] for n, _ in self.aux_field_specs]
            if layout == "element_last":
                coordsT = jnp.transpose(tables["coords_e"], (1, 2, 0))
                aux_named = {n: a.T for (n, _), a in
                             zip(self.aux_field_specs, aux_arrays)}

                def all_elems(ulT):
                    ops = ElemOpsBatched(tables["tabs"], tables["qweights"],
                                         coordsT, self.dim)
                    uu = self._split(ulT)
                    aux = dict(aux_scalars)
                    aux.update(aux_named)
                    aux["group"] = tables["elem_group"]
                    out = self.volume_form(ops, uu, aux)
                    parts = []
                    for un in self.unknowns:
                        r = out.get(un.name)
                        if r is None:     # forms may omit rows (zeros)
                            sl = self.local_slices[un.name]
                            r = jnp.zeros((sl.stop - sl.start,
                                           ulT.shape[1]), self.dtype)
                        parts.append(r)
                    return jnp.concatenate(parts)

                u_locT = u_loc.T                          # (ndt, ne)
                rT, lin = jax.linearize(all_elems, u_locT)
                r = rT.T
                jacT = None
                if with_jacobian:
                    eye = jnp.eye(self.ndt, dtype=self.dtype)
                    tang = jnp.broadcast_to(
                        eye[:, :, None],
                        (self.ndt,) + u_locT.shape)
                    jacT = jax.vmap(lin)(tang)            # (ndt_j, ndt_i, ne)
            else:
                r = jax.vmap(one)(u_loc, tables["coords_e"],
                                  tables["elem_group"], *aux_arrays)
            gather = tables.get("gather")
            if gather is not None:
                # scatter transposed into gather+sum (see gather_plan)
                rf = jnp.concatenate([r.ravel(),
                                      jnp.zeros(1, self.dtype)])
                R = rf[gather["row_src"]].sum(axis=1)
            else:
                R = (jnp.zeros(self.n_dofs_pad, self.dtype)
                     .at[tables["scatter_rows"].ravel()].add(
                         r.ravel(), mode="drop"))

            data = None
            if with_jacobian:
                if layout == "element_last":
                    jac = jnp.transpose(jacT, (2, 1, 0))  # (ne, ndt_i, ndt_j)
                else:
                    jac = jax.vmap(jax.jacfwd(one))(
                        u_loc, tables["coords_e"], tables["elem_group"],
                        *aux_arrays)
                if self.patch_tab is not None:
                    # patch-stencil target (algebra/patchstencil.py): every
                    # element scatters into its own patch's lattice slots
                    # (or, with a gather plan, slot-sources sum — the
                    # scatter-free TPU form, like the ELL fast path)
                    if gather is not None:
                        jf = jnp.concatenate([jac.ravel(),
                                              jnp.zeros(1, self.dtype)])
                        data = jf[gather["slot_src"]].sum(axis=1)
                    else:
                        data = (jnp.zeros(self._patch_size, self.dtype)
                                .at[tables["patch_slots"]]
                                .add(jac.ravel(), mode="drop"))
                    R = jnp.where(tables["dir_mask"], 0.0, R)
                    return R, data
                if gather is not None:
                    jf = jnp.concatenate([jac.ravel(),
                                          jnp.zeros(1, self.dtype)])
                    data = jf[gather["slot_src"]].sum(axis=1).reshape(nrows, w)
                else:
                    data_flat = (jnp.zeros(nrows * w, self.dtype)
                                 .at[tables["slots"]].add(jac.ravel(),
                                                          mode="drop"))
                    data = data_flat.reshape(nrows, w)

            # material-point contributions (monolithic MPM-FSI coupling)
            if (self.particle_form is not None
                    and tables.get("particles") is not None):
                pt = tables["particles"]
                pnames = self.particle_payload_names
                pay = [pt["payload"][k] for k in pnames]

                def pone(ul, m, *pv):
                    uu = self._split(ul)

                    def single(mi, *one):
                        pd = dict(zip(pnames, one))
                        out = self.particle_form(uu, pd, dict(aux_scalars))
                        parts = []
                        for un in self.unknowns:
                            rr = out.get(un.name)
                            if rr is None:
                                sl = self.local_slices[un.name]
                                rr = jnp.zeros(sl.stop - sl.start, self.dtype)
                            parts.append(rr)
                        vec = jnp.concatenate(parts)
                        return jnp.where(mi, vec, jnp.zeros_like(vec))

                    return jax.vmap(single)(m, *pv).sum(axis=0)

                rp = jax.vmap(pone)(u_loc, pt["mask"], *pay)
                R = R.at[tables["scatter_rows"].ravel()].add(
                    rp.ravel(), mode="drop")
                if with_jacobian:
                    jp = jax.vmap(jax.jacfwd(pone))(u_loc, pt["mask"], *pay)
                    data = (data.reshape(-1).at[tables["slots"]]
                            .add(jp.ravel(), mode="drop").reshape(nrows, w))

            # boundary faces
            if self.face_form is not None and getattr(
                    self, "face_form_volume", False):
                for b, bt in zip(self.face_batches, tables["faces"]):
                    ei = bt["eidx"]
                    ue_all = u[ei]
                    ftabs, fw = b["tabs"], bt["weights"]
                    vtabs = b["vtabs"]

                    def fone(ue, ecl, fcl, grp):
                        fops = VolumeFaceOps(vtabs, ftabs, fw, ecl, fcl,
                                             self.dim, 1.0)
                        uu = self._split(ue)
                        out = self.face_form(fops, uu, grp,
                                             dict(aux_scalars))
                        parts = []
                        for un in self.unknowns:
                            r = out.get(un.name)
                            if r is None:
                                sl = self.local_slices[un.name]
                                r = jnp.zeros(sl.stop - sl.start, self.dtype)
                            parts.append(r)
                        return jnp.concatenate(parts)

                    rf = jax.vmap(fone)(ue_all, bt["ecoords"], bt["coords"],
                                        bt["groups"])
                    R = R.at[ei.ravel()].add(rf.ravel(), mode="drop")
                    if with_jacobian:
                        jf = jax.vmap(jax.jacfwd(fone))(
                            ue_all, bt["ecoords"], bt["coords"], bt["groups"])
                        data = (data.reshape(-1).at[bt["slots"]]
                                .add(jf.ravel(), mode="drop").reshape(nrows, w))
            elif self.face_form is not None:
                for b, bt in zip(self.face_batches, tables["faces"]):
                    fd = bt["fdofs"]
                    uf = u[fd]
                    ftabs, fw = bt["tabs"], bt["weights"]
                    def fone(ul, cl, grp):
                        return self._face_residual(b, ftabs, fw, ul, cl, grp,
                                                   aux_scalars)
                    rf = jax.vmap(fone)(uf, bt["coords"], bt["groups"])
                    R = R.at[fd.ravel()].add(rf.ravel())
                    if with_jacobian:
                        jf = jax.vmap(jax.jacfwd(fone))(uf, bt["coords"], bt["groups"])
                        data = (data.reshape(-1).at[bt["slots"]]
                                .add(jf.ravel()).reshape(nrows, w))

            # Dirichlet: zero rows/cols, unit diagonal (symmetric elimination)
            dir_mask = tables["dir_mask"]
            R = jnp.where(dir_mask, 0.0, R)
            if with_jacobian:
                bad = dir_mask[row_ids] | dir_mask[tables["ell_cols"]]
                # exactly one unit entry on the diagonal of a Dirichlet row:
                # ell_valid excludes the diagonal-pointing padding slots
                ident = ((tables["ell_cols"] == row_ids) & dir_mask[row_ids]
                         & tables["ell_valid"])
                data = jnp.where(bad, jnp.where(ident, 1.0, 0.0), data)
            return R, data

        if pass_tables:
            return assemble_t

        def assemble(u, aux_fields=None, aux_scalars=None):
            return assemble_t(u, const_tables, aux_fields, aux_scalars)

        return assemble

    def make_diag_fn(self, pass_tables: bool = True):
        """Jacobian DIAGONAL without materializing global ELL data —
        the smoother scaling of the matrix-free operator path (SURVEY.md §7
        design inversion "two matrix paths": the fine-level operator is
        ``jax.linearize`` of the residual; only its diagonal is assembled).

        (u, tables, aux_fields, aux_scalars) -> diag (n_dofs_pad,).
        Volume contributions only: face/particle terms reach the
        matrix-free OPERATOR exactly (they are inside the residual that gets
        linearized); their rare diagonal contributions are neglected in the
        smoother scaling.  Dirichlet rows get exactly 1.
        """
        layout = getattr(self.volume_form, "layout", "element_last")
        const_tables = None if pass_tables else self.device_tables()

        def diag_t(u, tables, aux_fields=None, aux_scalars=None):
            aux_fields = aux_fields or {}
            aux_scalars = aux_scalars or {}
            u = u.astype(self.dtype)
            u_loc = u[tables["edofs"]]
            aux_loc = {name: aux_fields[name][tables["aux_conn"][name]]
                       for name, _ in self.aux_field_specs}
            tabs, qw = tables["tabs"], tables["qweights"]
            if layout == "element_last":
                coordsT = jnp.transpose(tables["coords_e"], (1, 2, 0))
                aux_named = {n: aux_loc[n].T
                             for n, _ in self.aux_field_specs}

                def all_elems(ulT):
                    ops = ElemOpsBatched(tabs, qw, coordsT, self.dim)
                    uu = self._split(ulT)
                    aux = dict(aux_scalars)
                    aux.update(aux_named)
                    aux["group"] = tables["elem_group"]
                    out = self.volume_form(ops, uu, aux)
                    parts = []
                    for un in self.unknowns:
                        r = out.get(un.name)
                        if r is None:
                            sl = self.local_slices[un.name]
                            r = jnp.zeros((sl.stop - sl.start,
                                           ulT.shape[1]), self.dtype)
                        parts.append(r)
                    return jnp.concatenate(parts)

                _, lin = jax.linearize(all_elems, u_loc.T)
                eye = jnp.eye(self.ndt, dtype=self.dtype)
                tang = jnp.broadcast_to(eye[:, :, None],
                                        (self.ndt,) + u_loc.T.shape)
                jacT = jax.vmap(lin)(tang)             # (ndt_j, ndt_i, ne)
                dloc = jnp.diagonal(jacT, axis1=0, axis2=1)  # (ne, ndt)
            else:
                def one(ul, cl, grp, *aux_vals):
                    al = dict(zip([n for n, _ in self.aux_field_specs],
                                  aux_vals))
                    al["group"] = grp
                    return self._elem_residual(tabs, qw, ul, cl, al,
                                               aux_scalars)

                aux_arrays = [aux_loc[n] for n, _ in self.aux_field_specs]
                jac = jax.vmap(jax.jacfwd(one))(
                    u_loc, tables["coords_e"], tables["elem_group"],
                    *aux_arrays)
                dloc = jnp.diagonal(jac, axis1=1, axis2=2)   # (ne, ndt)
            diag = (jnp.zeros(self.n_dofs_pad, self.dtype)
                    .at[tables["scatter_rows"].ravel()]
                    .add(dloc.ravel(), mode="drop"))
            return jnp.where(tables["dir_mask"], 1.0, diag)

        if pass_tables:
            return diag_t

        def diag_fn(u, aux_fields=None, aux_scalars=None):
            return diag_t(u, const_tables, aux_fields, aux_scalars)

        return diag_fn

    def _face_slots(self, batch):
        if "slots" not in batch:
            lut = _build_slot_lut(self.pattern)
            fd = (batch["eidx"] if getattr(self, "face_form_volume", False)
                  else batch["fdofs"])
            n = fd.shape[1]
            rows = np.repeat(fd, n, axis=1).ravel()
            cols = np.tile(fd, (1, n)).ravel()
            batch["slots"] = lut(rows, cols).reshape(fd.shape[0], n, n)
        return batch["slots"]

    # ------------------------------------------------------------------
    def new_op(self) -> SparseOp:
        return op_from_pattern(self.pattern, dtype=self.dtype)

    def op_with(self, data: jnp.ndarray, cols: jnp.ndarray = None):
        """Wrap assembled matrix data as a device operator.

        ELL layout -> SparseOp; patch layout (set_patch_layout) ->
        PatchStencilOp with stencil-form Dirichlet elimination applied.
        Inside jit, pass ``cols=tables["ell_cols"]`` (device_tables) so the
        multi-M-entry column table enters as an argument instead of a baked
        HLO constant (FSI fine levels: ~9M entries, minutes of XLA
        constant folding otherwise)."""
        if self.patch_tab is not None:
            tab = self.patch_tab
            from ..algebra.patchstencil3d import PatchTables3D
            if isinstance(tab, PatchTables3D):
                from ..algebra.patchstencil3d import (K3,
                                                      dirichlet_eliminate_3d,
                                                      make_patch_op_3d)
                wt = data.reshape(K3, tab.H, tab.H, tab.H, tab.Pp)
                op = make_patch_op_3d(tab, wt)
                return dirichlet_eliminate_3d(
                    op, jnp.asarray(self.dirichlet_mask),
                    jnp.asarray(tab.owner))
            from ..algebra.patchstencil import (K, dirichlet_eliminate,
                                                dirichlet_eliminate_block,
                                                make_block_patch_op,
                                                make_patch_op)
            nv = getattr(self, "_patch_nv", 1)
            if nv > 1:
                wt = data.reshape(nv * nv * K, tab.H, tab.H, tab.Pp)
                op = make_block_patch_op(tab, wt, nv)
                return dirichlet_eliminate_block(
                    op, jnp.asarray(self.dirichlet_mask),
                    jnp.asarray(tab.owner))
            wt = data.reshape(K, tab.H, tab.H, tab.Pp)
            op = make_patch_op(tab, wt)
            return dirichlet_eliminate(op, jnp.asarray(self.dirichlet_mask),
                                       jnp.asarray(tab.owner))
        if cols is None:
            cols = jnp.asarray(self.pattern.cols)
        return SparseOp(data, cols, self.pattern.n_cols)


def _build_slot_lut(pattern: EllPattern):
    """Return lut(rows, cols) -> flat ELL slot index.

    CSR entries sorted by (row, col) form a globally sorted key sequence, so a
    single searchsorted resolves every query; the ELL slot is then
    row * width + within-row position."""
    counts = np.diff(pattern.indptr)
    csr_rows = np.repeat(np.arange(pattern.n_rows, dtype=np.int64), counts)
    csr_keys = csr_rows * pattern.n_cols + pattern.indices
    ell_slots = pattern.csr_to_ell_slots()

    def lut(rows, cols):
        keys = rows.astype(np.int64) * pattern.n_cols + cols.astype(np.int64)
        pos = np.searchsorted(csr_keys, keys)
        assert np.all(csr_keys[pos] == keys), "query pair outside pattern"
        return ell_slots[pos]

    return lut
