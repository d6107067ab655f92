"""Scatter-free assembly into stencil format for lattice (box) meshes.

On TPU the generic assembly path's weak point is the Jacobian scatter:
ne * ndt^2 scatter-adds into the ELL array run ~50x slower than the batched
jacfwd compute that produces them (measured: 1.66 s vs ~35 ms for the
residual path on a 512^2 Q2 Poisson).  The reference never faces this —
MatSetValues caches and PETSc inserts on close() (SURVEY.md §3.3) — but a
TPU design must not scatter at all.

On a structured box mesh the inverse scatter map is affine: with dof lattice
id = iy*M + ix and element grid (ex, ey), local dof i sits at
(s*ey + b_i, s*ex + a_i) for family order s, so the (i, j) Jacobian plane
jac[:, i, j] (reshaped to the element grid) lands on the stencil slab

    data[k(i,j), b_i + s*ey, a_i + s*ex]  with  k(i,j) = (b_j-b_i, a_j-a_i)

— a STRIDED SLICE ADD per (i, j) pair: pure vectorized VPU work, no
gathers, no scatters, and the output is directly the StencilOp the SpMV
fast path consumes (algebra/stencil.py) — the ELL/DIA relayout disappears
too.

Built for single-unknown problems on 2-D quad lattices (the shape of the
bench and of structured MG level operators); everything is verified on the
host at plan-build time and returns None when the mesh is not a lattice.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra.stencil import StencilOp, _round_up


@dataclasses.dataclass
class LatticePlan:
    grid: Tuple[int, int]          # dof lattice (N, M)
    egrid: Tuple[int, int]         # element grid (ney, nex)
    s: int                         # family order (nodes stride per element)
    a: np.ndarray                  # (ndt,) local dof x-offset
    b: np.ndarray                  # (ndt,) local dof y-offset
    offsets: Tuple[Tuple[int, int], ...]   # stencil offsets (di, dj)
    kij: np.ndarray                # (ndt, ndt) -> offset index
    rows_per_tile: int = 16


def build_lattice_plan(asm, rows_per_tile: int = 16) -> Optional[LatticePlan]:
    """Detect the lattice structure of a single-unknown Assembler."""
    if len(asm.unknowns) != 1:
        return None
    mesh = asm.mesh
    if mesh.geom != "quad":
        return None
    dm = asm.dofmaps[asm.unknowns[0].name]
    xy = mesh.coords[dm.nodes]
    xs = np.unique(np.round(xy[:, 0], 12))
    M = len(xs)
    n = dm.n_dofs
    if n % M:
        return None
    N = n // M
    ids = dm.conn                            # (ne, ndt)
    px, py = ids % M, ids // M
    x0, y0 = px.min(axis=1), py.min(axis=1)
    a = px - x0[:, None]
    b = py - y0[:, None]
    if (a != a[0]).any() or (b != b[0]).any():
        return None
    a, b = a[0], b[0]
    s = int(a.max())
    if s == 0 or (x0 % s).any() or (y0 % s).any():
        return None
    ex, ey = x0 // s, y0 // s
    nex, ney = int(ex.max()) + 1, int(ey.max()) + 1
    if nex * ney != mesh.n_elems:
        return None
    # elements must be stored row-major over the element grid so that
    # jac[:, i, j].reshape(ney, nex) IS the element plane
    if (ex != np.tile(np.arange(nex), ney)).any() or \
       (ey != np.repeat(np.arange(ney), nex)).any():
        return None
    ndt = ids.shape[1]
    offs, kij = [], np.zeros((ndt, ndt), np.int32)
    seen = {}
    for i in range(ndt):
        for j in range(ndt):
            o = (int(b[j] - b[i]), int(a[j] - a[i]))
            if o not in seen:
                seen[o] = len(offs)
                offs.append(o)
            kij[i, j] = seen[o]
    return LatticePlan((N, M), (ney, nex), s, a, b, tuple(offs), kij,
                       rows_per_tile)


def make_lattice_assemble_fn(asm, plan: LatticePlan) -> Callable:
    """Jittable (u, tables, aux_fields, aux_scalars) -> (R, StencilOp).

    Reuses the engine's batched element residual + jacfwd; replaces both
    scatters with strided slice adds; applies the engine's symmetric
    Dirichlet elimination directly on the stencil slabs."""
    N, M = plan.grid
    ney, nex = plan.egrid
    s = plan.s
    K = len(plan.offsets)
    ndt = len(plan.a)
    R_tile = plan.rows_per_tile
    Nt = _round_up(N, R_tile)
    hw = max(abs(dj) for _, dj in plan.offsets)
    Mp = _round_up(M, 128)
    if Mp < M + 2 * hw:
        Mp = _round_up(M + 2 * hw, 128)
    k0 = plan.offsets.index((0, 0))
    dir_mask2 = np.asarray(asm.dirichlet_mask[:N * M]).reshape(N, M)
    dir2 = jnp.asarray(dir_mask2)

    def shifted_mask(di, dj):
        """dir2 evaluated at (i+di, j+dj), False outside."""
        z = np.zeros((N + 2 * abs(di), M + 2 * abs(dj)), bool)
        z[abs(di):abs(di) + N, abs(dj):abs(dj) + M] = dir_mask2
        return jnp.asarray(z[abs(di) + di:abs(di) + di + N,
                             abs(dj) + dj:abs(dj) + dj + M])

    col_masks = [shifted_mask(di, dj) for (di, dj) in plan.offsets]

    def assemble(u, tables, aux_fields=None, aux_scalars=None):
        aux_fields = aux_fields or {}
        aux_scalars = aux_scalars or {}
        u = u.astype(asm.dtype)
        u_loc = u[tables["edofs"]][:nex * ney]
        aux_loc = {name: aux_fields[name][tables["aux_conn"][name]]
                   for name, _ in asm.aux_field_specs}
        tabs, qw = tables["tabs"], tables["qweights"]

        def one(ul, cl, grp, *aux_vals):
            al = dict(zip([n for n, _ in asm.aux_field_specs], aux_vals))
            al["group"] = grp
            return asm._elem_residual(tabs, qw, ul, cl, al, aux_scalars)

        aux_arrays = [aux_loc[n][:nex * ney] for n, _ in asm.aux_field_specs]
        coords_e = tables["coords_e"][:nex * ney]
        egrp = tables["elem_group"][:nex * ney]
        r = jax.vmap(one)(u_loc, coords_e, egrp, *aux_arrays)
        jac = jax.vmap(jax.jacfwd(one))(u_loc, coords_e, egrp, *aux_arrays)
        r = r.reshape(ney, nex, ndt)
        jac = jac.reshape(ney, nex, ndt, ndt)

        R2 = jnp.zeros((N, M), asm.dtype)
        for i in range(ndt):
            ai, bi = int(plan.a[i]), int(plan.b[i])
            R2 = R2.at[bi:bi + s * ney:s, ai:ai + s * nex:s].add(r[:, :, i])
        R2 = jnp.where(dir2, 0.0, R2)

        data = jnp.zeros((K, N, M), asm.dtype)
        for i in range(ndt):
            ai, bi = int(plan.a[i]), int(plan.b[i])
            for j in range(ndt):
                k = int(plan.kij[i, j])
                data = data.at[k, bi:bi + s * ney:s,
                               ai:ai + s * nex:s].add(jac[:, :, i, j])
        # symmetric Dirichlet elimination on the slabs
        for k in range(K):
            bad = dir2 | col_masks[k]
            ident = dir2 if k == k0 else jnp.zeros_like(dir2)
            data = data.at[k].set(
                jnp.where(bad, jnp.where(ident, 1.0, 0.0), data[k]))
        data_p = jnp.zeros((K, Nt, Mp), asm.dtype).at[:, :N, :M].set(data)
        R = jnp.zeros(asm.n_dofs_pad, asm.dtype).at[:N * M].set(R2.reshape(-1))
        return R, StencilOp(data_p, plan.offsets, (N, M))

    return assemble
