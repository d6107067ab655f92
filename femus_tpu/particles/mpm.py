"""Material point method: particle <-> grid transfer and explicit dynamics.

Reference: the MPM half of ``src/ism/`` — ``Marker`` particle state (mass,
velocity, acceleration, deformation gradient, Marker.hpp:248-320) and
``Line``'s grid transfer helpers (``GetParticlesToGridMaterial``,
``UpdateLineMPM``, Line.hpp:75-87), used by the MPM_FEM / MPM_FSI apps.

TPU design: particles are one struct-of-arrays batch; every stage is a
batched jitted kernel over the cloud —

  Transfer uses the (non-negative) linear Lagrange basis by default —
  quadratic bases take negative values, producing near-zero/negative grid
  masses at support edges (the standard MPM restriction).

  P2G:  m_i = sum_p m_p phi_i(x_p);  (mv)_i = sum_p m_p v_p phi_i(x_p);
        f_i = - sum_p V_p sigma_p . grad phi_i(x_p)     [segment_sum scatter]
  grid: v* = (mv + dt (f + m g)) / m, essential BCs zeroed on grid dofs
  G2P:  v_p <- PIC/FLIP blend, x_p += dt v*, F_p <- (I + dt grad v*) F_p
        [gather + vmap]

Owner elements/local coords ride the marker machinery (neighbor-walk
relocation after the position update).  Sharded clouds migrate via
all_to_all exactly like advected markers.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fe.basis import get_basis
from ..fe.geom import GEOMS
from ..mesh.mesh import Mesh
from .markers import MarkerCloud, _geo_tables, _inverse_newton, locate


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MPMState:
    """Particle state pytree (all (np_, ...) arrays)."""

    x: jnp.ndarray          # (np_, dim) positions
    v: jnp.ndarray          # (np_, dim) velocities
    F: jnp.ndarray          # (np_, dim, dim) deformation gradient
    mass: jnp.ndarray       # (np_,)
    vol0: jnp.ndarray       # (np_,) initial volume
    elem: jnp.ndarray       # (np_,) owner element


def init_particles(mesh: Mesh, region_fn: Callable, ppc: int = 4,
                   density: float = 1.0, vel_fn: Optional[Callable] = None,
                   seed: int = 0) -> MPMState:
    """Seed ``ppc``^dim particles per element (tensor lattice in the
    reference cell) inside ``region_fn(x)->bool``."""
    g = GEOMS[mesh.geom]
    b = get_basis(mesh.geom, "biquadratic")
    # lattice of local coords in the reference element
    t = (np.arange(ppc) + 0.5) / ppc
    if mesh.geom in ("quad", "hex", "edge"):
        axes = [2 * t - 1] * mesh.dim
        xi = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, mesh.dim)
        ref_vol = 2.0 ** mesh.dim
    elif mesh.geom == "tri":
        pts = np.stack(np.meshgrid(t, t, indexing="ij"), -1).reshape(-1, 2)
        xi = np.where(pts.sum(1, keepdims=True) > 1, 1 - pts[:, ::-1], pts)
        ref_vol = 0.5
    else:
        raise NotImplementedError(mesh.geom)
    phi = np.asarray(b.eval(xi))                        # (npp, n_bq)
    dphi = np.asarray(b.eval_grad(xi))                  # (npp, n_bq, dim)
    ec = mesh.coords[mesh.conn]                         # (ne, n_bq, dim)
    xp = np.einsum("pn,end->epd", phi, ec).reshape(-1, mesh.dim)
    J = np.einsum("pnd,enx->epxd", dphi, ec)
    detJ = np.abs(np.linalg.det(J)).reshape(-1)
    vol = detJ * ref_vol / (ppc ** mesh.dim)
    elem = np.repeat(np.arange(mesh.n_elems), len(xi))
    keep = np.asarray(region_fn(xp), bool)
    xp, vol, elem = xp[keep], vol[keep], elem[keep]
    v = (np.asarray(vel_fn(xp)) if vel_fn is not None
         else np.zeros_like(xp))
    n = len(xp)
    return MPMState(
        x=jnp.asarray(xp), v=jnp.asarray(v),
        F=jnp.broadcast_to(jnp.eye(mesh.dim), (n, mesh.dim, mesh.dim)).copy(),
        mass=jnp.asarray(density * vol), vol0=jnp.asarray(vol),
        elem=jnp.asarray(elem))


def neo_hookean_stress(mu: float, lam: float):
    """Cauchy stress sigma(F) for a compressible neo-Hookean solid
    (reference Solid model 1, Solid.cpp:72-75)."""
    def stress(F):
        dim = F.shape[-1]
        Jd = jnp.maximum(jnp.linalg.det(F), 1e-6)[..., None, None]
        B = F @ jnp.swapaxes(F, -1, -2)
        I = jnp.eye(dim, dtype=F.dtype)
        return (mu * (B - I) + lam * jnp.log(Jd) * I) / Jd
    return stress


def make_mpm_step(mesh: Mesh, stress_fn: Callable,
                  family: str = "linear",
                  gravity: Tuple[float, ...] = (0.0, -9.81),
                  flip: float = 0.95,
                  fixed_dofs: Optional[np.ndarray] = None,
                  max_hops: int = 3, dtype=None):
    """Build the jitted explicit MPM step: state -> state.

    fixed_dofs: boolean (n_family_dofs,) — grid velocity zeroed there
    (essential boundary, e.g. walls)."""
    dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    g = GEOMS[mesh.geom]
    b = get_basis(mesh.geom, family)
    dm = mesh.dofmap(family)
    fam_local = g.family_nodes[family]
    econn = jnp.asarray(dm.node_to_dof[mesh.conn[:, fam_local]])  # (ne, nd)
    conn_geo, coords, neigh = _geo_tables(mesh, dtype)
    n_dofs = dm.n_dofs
    dim = mesh.dim
    grav = jnp.asarray(gravity[:dim], dtype)
    fixed = (jnp.asarray(fixed_dofs) if fixed_dofs is not None
             else jnp.zeros(n_dofs, bool))
    center = jnp.asarray(g.center, dtype)
    from .markers import _FACE_VIOLATION
    viol = _FACE_VIOLATION[mesh.geom]

    def shape_at(xp, e):
        """phi (nd,), grad phi (nd, dim) of the family basis at particle."""
        ce = coords[conn_geo[e]]
        xi = _inverse_newton(mesh.geom, ce, xp, center)
        phi = b.eval(xi[None, :], jnp)[0]
        dphi = b.eval_grad(xi[None, :], jnp)[0]          # ref grads
        gb = get_basis(mesh.geom, "biquadratic")
        Jg = gb.eval_grad(xi[None, :], jnp)[0].T @ ce    # (dim, dim)
        gphys = dphi @ jnp.linalg.inv(Jg)                # (nd, dim)
        return phi, gphys

    def relocate(xp, e):
        def body(carry, _):
            e, done = carry
            ce = coords[conn_geo[e]]
            xi = _inverse_newton(mesh.geom, ce, xp, center)
            v = viol(xi)
            inside = jnp.max(v) < 1e-9
            nxt = neigh[e, jnp.argmax(v)]
            e_new = jnp.where(inside | done, e, jnp.where(nxt < 0, e, nxt))
            return (e_new, done | inside), None
        (e, _), _ = jax.lax.scan(body, (e, jnp.asarray(False)), None,
                                 length=max_hops)
        return e

    def step(s: MPMState, dt) -> MPMState:
        phi, gphi = jax.vmap(shape_at)(s.x, s.elem)      # (np_, nd), (np_, nd, dim)
        dofs = econn[s.elem]                             # (np_, nd)
        sig = stress_fn(s.F)                             # (np_, dim, dim)
        volp = s.vol0 * jnp.linalg.det(s.F)

        # P2G scatter
        mi = jax.ops.segment_sum((s.mass[:, None] * phi).ravel(),
                                 dofs.ravel(), num_segments=n_dofs)
        mv = jnp.stack([jax.ops.segment_sum(
            (s.mass[:, None] * s.v[:, d:d + 1] * phi).ravel(), dofs.ravel(),
            num_segments=n_dofs) for d in range(dim)], axis=1)
        fint = jnp.stack([jax.ops.segment_sum(
            -(volp[:, None] * jnp.einsum("pxd,pnd->pnx", sig, gphi)[:, :, d]
              ).ravel(), dofs.ravel(), num_segments=n_dofs)
            for d in range(dim)], axis=1)

        # small-mass cutoff RELATIVE to the particle mass scale.  With
        # linear-hat transfer, grad phi stays O(1/h) while phi -> 0 at a
        # node's support edge, so f_i/m_i is unbounded for sliver nodes
        # (the MPM cell-crossing instability); nodes carrying less than a
        # few percent of one particle are dropped from the grid solve.
        thr = 3e-2 * jnp.mean(s.mass)
        m_safe = jnp.maximum(mi, thr)[:, None]
        v_old = mv / m_safe
        v_new = v_old + dt * (fint / m_safe + grav[None, :])
        act = (mi > thr)[:, None]
        v_old = jnp.where(act & ~fixed[:, None], v_old, 0.0)
        v_new = jnp.where(act & ~fixed[:, None], v_new, 0.0)

        # G2P gather
        vg_new = jnp.einsum("pn,pnx->px", phi, v_new[dofs])
        vg_old = jnp.einsum("pn,pnx->px", phi, v_old[dofs])
        gradv = jnp.einsum("pnd,pnx->pxd", gphi, v_new[dofs])
        v_p = flip * (s.v + vg_new - vg_old) + (1 - flip) * vg_new
        x_p = s.x + dt * vg_new
        I = jnp.eye(dim, dtype=s.F.dtype)
        F_p = (I[None] + dt * gradv) @ s.F
        e_p = jax.vmap(relocate)(x_p, s.elem)
        return MPMState(x=x_p, v=v_p, F=F_p, mass=s.mass, vol0=s.vol0,
                        elem=e_p)

    return jax.jit(step)


def grid_fields(mesh: Mesh, s: MPMState, family: str = "linear"):
    """Diagnostic P2G of mass/momentum (reference GetParticlesToGridMaterial
    flavor): returns (m_i, (mv)_i) numpy arrays."""
    step_in = make_mpm_step(mesh, neo_hookean_stress(0.0, 0.0), family,
                            gravity=(0.0,) * mesh.dim)
    # reuse the internal scatter by a zero-dt step is wasteful; do it directly
    g = GEOMS[mesh.geom]
    b = get_basis(mesh.geom, family)
    dm = mesh.dofmap(family)
    fam_local = g.family_nodes[family]
    econn = dm.node_to_dof[mesh.conn[:, fam_local]]
    cloud = MarkerCloud(mesh, np.asarray(s.x), np.asarray(s.elem))
    conn_geo, coords, _ = _geo_tables(mesh, jnp.float64)
    center = jnp.asarray(g.center)

    def shape(xp, e):
        ce = coords[conn_geo[e]]
        xi = _inverse_newton(mesh.geom, ce, xp, center)
        return b.eval(xi[None, :], jnp)[0]

    phi = jax.jit(jax.vmap(shape))(jnp.asarray(s.x), jnp.asarray(s.elem))
    dofs = econn[np.asarray(s.elem)]
    mi = np.zeros(dm.n_dofs)
    np.add.at(mi, dofs.ravel(), np.asarray(s.mass[:, None] * phi).ravel())
    mv = np.zeros((dm.n_dofs, mesh.dim))
    for d in range(mesh.dim):
        np.add.at(mv[:, d], dofs.ravel(),
                  np.asarray(s.mass[:, None] * s.v[:, d:d + 1] * phi).ravel())
    return mi, mv
