"""Lagrangian markers / particle tracking (ISM).

Reference: ``Marker`` (Marker.hpp:38 — coords, owner element search
GetElement/GetElementSerial :408-410, inverse reference mapping
InverseMappingTEST :417) and ``Line`` (Line.hpp:34 — particle set;
``AdvectionParallel(n, T, order)`` RK advection with cross-proc hand-off
:75).  TPU design: one struct-of-arrays cloud; per-substep everything is a
batched jitted kernel —

  inverse isoparametric Newton (fe/tabulate.inverse_map_newton, batched) ->
  FE velocity interpolation -> RK update -> neighbor-walk element relocation
  (fixed-hop ``fori`` over the precomputed element-neighbor table; the
  cross-shard hand-off of the reference becomes an all_to_all when clouds are
  sharded).

Markers that exit the domain are parked (elem = -1) and ignored.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fe.basis import get_basis
from ..fe.geom import GEOMS
from ..mesh.mesh import Mesh, elem_neighbors

# reference-coordinate face violations per geometry (face order of geom.py):
# fn(xi) -> (n_faces,) positive where xi lies beyond that face
_FACE_VIOLATION = {
    "edge": lambda xi: jnp.stack([-(1 + xi[0]), xi[0] - 1]),
    "quad": lambda xi: jnp.stack([-(1 + xi[1]), xi[0] - 1, xi[1] - 1, -(1 + xi[0])]),
    "tri": lambda xi: jnp.stack([-xi[1], xi[0] + xi[1] - 1, -xi[0]]),
    "hex": lambda xi: jnp.stack([-(1 + xi[2]), xi[2] - 1, -(1 + xi[1]),
                                 xi[0] - 1, xi[1] - 1, -(1 + xi[0])]),
    "tet": lambda xi: jnp.stack([-xi[2], -xi[1], xi[0] + xi[1] + xi[2] - 1, -xi[0]]),
    "wedge": lambda xi: jnp.stack([-(1 + xi[2]), xi[2] - 1, -xi[1],
                                   xi[0] + xi[1] - 1, -xi[0]]),
}


@dataclasses.dataclass
class MarkerCloud:
    """Struct-of-arrays particle set bound to one mesh level."""

    mesh: Mesh
    x: np.ndarray                 # (np_, dim)
    elem: np.ndarray              # (np_,) owner element (-1 = outside)
    fields: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    @property
    def n(self) -> int:
        return self.x.shape[0]


def _geo_tables(mesh: Mesh, dtype):
    g = GEOMS[mesh.geom]
    geo_local = g.family_nodes["biquadratic"]
    conn = jnp.asarray(mesh.conn[:, geo_local])
    coords = jnp.asarray(mesh.coords, dtype)
    neigh = jnp.asarray(elem_neighbors(mesh))
    return conn, coords, neigh


def _inverse_newton(geom: str, coords_e, xp_phys, xi0, iters: int = 6):
    b = get_basis(geom, "biquadratic")

    def step(xi, _):
        phi = b.eval(xi[None, :], jnp)[0]
        dphi = b.eval_grad(xi[None, :], jnp)[0]
        r = phi @ coords_e - xp_phys
        J = dphi.T @ coords_e
        dxi = jnp.linalg.solve(J.T, r)
        return xi - dxi, None

    # tie the initial carry to the inputs so its "varying" axes match the
    # scan body's output under shard_map (see jax shard_map scan-vma rule)
    xi, _ = jax.lax.scan(step, xi0 + 0.0 * xp_phys, None, length=iters)
    return xi


def locate(cloud: MarkerCloud, guess: Optional[np.ndarray] = None,
           max_hops: int = 64) -> None:
    """Initial owner-element search (host): nearest-centroid guess + neighbor
    walk (reference GetElementSerial)."""
    mesh = cloud.mesh
    g = GEOMS[mesh.geom]
    cent = mesh.coords[mesh.conn[:, :g.n_verts]].mean(axis=1)
    from scipy.spatial import cKDTree
    tree = cKDTree(cent)
    _, e0 = tree.query(cloud.x)
    conn, coords, neigh = _geo_tables(mesh, jnp.float64)
    viol = _FACE_VIOLATION[mesh.geom]
    center = jnp.asarray(g.center)

    def find(xp, e):
        def body(carry, _):
            e, done = carry
            ce = coords[conn[e]]
            xi = _inverse_newton(mesh.geom, ce, xp, center, iters=8)
            v = viol(xi)
            inside = jnp.max(v) < 1e-10
            face = jnp.argmax(v)
            nxt = neigh[e, face]
            e_new = jnp.where(inside | done, e, jnp.where(nxt < 0, e, nxt))
            stuck = (~inside) & (nxt < 0)
            return (e_new, done | inside | stuck), inside | stuck

        (e, done), _ = jax.lax.scan(body, (e, jnp.asarray(False)), None,
                                    length=max_hops)
        ce = coords[conn[e]]
        xi = _inverse_newton(mesh.geom, ce, xp, center, iters=8)
        ok = jnp.max(viol(xi)) < 1e-8
        return jnp.where(ok, e, -1)

    es = jax.jit(jax.vmap(find))(jnp.asarray(cloud.x), jnp.asarray(e0))
    cloud.elem = np.asarray(es, np.int64)


def make_advect_fn(mesh: Mesh, vel_families: Sequence[str], order: int = 2,
                   max_hops: int = 4, dtype=None,
                   force_fn: Optional[Callable] = None):
    """Build a jitted advection substep over a velocity FE field.

    Returns step(x, elem, vel_dofs: tuple of (n_dofs,) per component, dt)
    -> (x_new, elem_new).  order: 2 (midpoint RK2) or 4 (classical RK4)
    (reference Line::AdvectionParallel RK2/RK4).  force_fn(x) -> (dim,)
    adds a body-force velocity increment (the reference's optional Force
    argument — e.g. particles.forces.magnetic_force)."""
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    g = GEOMS[mesh.geom]
    dim = mesh.dim
    conn, coords, neigh = _geo_tables(mesh, dtype)
    vconns = [jnp.asarray(mesh.dofmap(f).conn) for f in vel_families]
    vbases = [get_basis(mesh.geom, f) for f in vel_families]
    viol = _FACE_VIOLATION[mesh.geom]
    center = jnp.asarray(g.center, dtype)

    def velocity(xp, e, vel_dofs):
        ce = coords[conn[e]]
        xi = _inverse_newton(mesh.geom, ce, xp, center)
        comps = []
        for d in range(dim):
            phi = vbases[d].eval(xi[None, :], jnp)[0]
            comps.append(phi @ vel_dofs[d][vconns[d][e]])
        vv = jnp.stack(comps)
        if force_fn is not None:
            vv = vv + force_fn(xp)
        return vv

    def relocate(xp, e):
        def body(carry, _):
            e, done = carry
            ce = coords[conn[e]]
            xi = _inverse_newton(mesh.geom, ce, xp, center)
            v = viol(xi)
            inside = jnp.max(v) < 1e-9
            face = jnp.argmax(v)
            nxt = neigh[e, face]
            left = (~inside) & (nxt < 0)
            e_new = jnp.where(inside | done | left, e, nxt)
            return (e_new, done | inside | left), None

        (e, _), _ = jax.lax.scan(body, (e, e != e), None,
                                 length=max_hops)
        ce = coords[conn[e]]
        xi = _inverse_newton(mesh.geom, ce, xp, center)
        ok = jnp.max(viol(xi)) < 1e-6
        return jnp.where(ok, e, -1)

    def substep(xp, e, vel_dofs, dt):
        alive = e >= 0
        esafe = jnp.maximum(e, 0)
        if order == 4:
            k1 = velocity(xp, esafe, vel_dofs)
            k2 = velocity(xp + 0.5 * dt * k1, esafe, vel_dofs)
            k3 = velocity(xp + 0.5 * dt * k2, esafe, vel_dofs)
            k4 = velocity(xp + dt * k3, esafe, vel_dofs)
            dx = dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        else:
            k1 = velocity(xp, esafe, vel_dofs)
            k2 = velocity(xp + 0.5 * dt * k1, esafe, vel_dofs)
            dx = dt * k2
        x_new = jnp.where(alive, xp + dx, xp)
        e_new = jnp.where(alive, relocate(x_new, esafe), e)
        return x_new, e_new

    @jax.jit
    def step(x, elem, vel_dofs, dt):
        return jax.vmap(lambda xp, e: substep(xp, e, vel_dofs, dt))(x, elem)

    return step


def advect(cloud: MarkerCloud, vel_dofs: Sequence[np.ndarray],
           vel_families: Sequence[str], T: float, n_steps: int,
           order: int = 2, force_fn: Optional[Callable] = None) -> None:
    """Advect the cloud through a steady velocity field for time T
    (reference Line::AdvectionParallel)."""
    step = make_advect_fn(cloud.mesh, vel_families, order, force_fn=force_fn)
    dt = T / n_steps
    x = jnp.asarray(cloud.x)
    e = jnp.asarray(cloud.elem)
    vd = tuple(jnp.asarray(v) for v in vel_dofs)
    for _ in range(n_steps):
        x, e = step(x, e, vd, dt)
    cloud.x = np.asarray(x)
    cloud.elem = np.asarray(e)
