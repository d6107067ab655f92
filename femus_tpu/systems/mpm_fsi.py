"""Monolithic implicit MPM-FSI on a fixed background mesh.

Reference: ``applications/MPM_FSI`` — the background grid carries the fluid
unknowns (velocity + pressure, incompressible NS); the immersed solid is a
material-point cloud.  Inside the assembly loop the reference adds the solid
particles' inertia and internal stress to the momentum rows of their owner
elements (particle-grid transfer helpers Line.hpp:81-87,
``GetParticlesToGridMaterial``/``UpdateLineMPM``), then solves the coupled
system implicitly and updates the particles from the grid solution.

TPU design (fictitious-domain / mixture form):

- background unknowns (vel..., p) are one Assembler with the transient NS
  volume form everywhere (backward Euler, old velocity as aux fields);
- the solid enters through the engine's *particle form*
  (``Assembler.set_particle_form``): for each particle, the grid velocity
  field pushes the deformation gradient forward implicitly
  ``F^{n+1} = (I + dt grad v) F^n``; the residual gains
    inertia   (m_p − ρ_f V_p) (v(x_p) − v_p^n)/dt · φ_i(x_p)
    stress    V_p  σ_s(F^{n+1}) : ∇φ_i(x_p)      (minus the fluid stress
                                                   already counted there,
                                                   scaled by δρ when set)
    gravity  −(m_p − ρ_f V_p) g · φ_i(x_p)
  (the ρ_f V_p subtraction removes the double-counted fictitious fluid);
- everything is differentiable, so the engine's batched ``jacfwd`` yields
  the exact monolithic Newton matrix — the adept analogue in the reference;
- after Newton converges: G2P — v_p ← FLIP/PIC blend, x_p += dt v(x_p),
  F_p ← (I + dt ∇v) F_p, neighbor-walk relocation (marker machinery).

Particle regrouping per step is a host pass (static (ne, ppe) capacity —
the particle_tables contract).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..assembly.bc import generate_bdc
from ..assembly.engine import Assembler, Unknown
from ..assembly.forms import navier_stokes
from ..fe.basis import get_basis
from ..fe.geom import GEOMS
from ..mesh.mesh import Mesh
from ..particles.markers import _FACE_VIOLATION, _geo_tables, _inverse_newton
from ..particles.mpm import MPMState


class MonolithicMPMFSI:
    """Implicit MPM-FSI stepper: background NS + material-point solid."""

    def __init__(self, mesh: Mesh, solid_stress: Callable,
                 rho_s: float, rho_f: float, mu_f: float,
                 bc_fn: Callable, dt: float,
                 vel_family: str = "biquadratic", pres_family: str = "linear",
                 gravity: Tuple[float, ...] = (0.0, -9.81),
                 ppe: int = 16, flip: float = 0.95,
                 newton_iters: int = 8, newton_tol: float = 1e-9,
                 pin_pressure: bool = True):
        self.mesh = mesh
        self.dim = mesh.dim
        self.dt = dt
        self.flip = flip
        self.ppe = ppe
        self.rho_f = rho_f
        self.newton_iters = newton_iters
        self.newton_tol = newton_tol
        self.stress = solid_stress
        dim = self.dim
        vel_names = ["U", "V", "W"][:dim]
        self.vel_names = vel_names
        unknowns = [Unknown(n, vel_family) for n in vel_names]
        unknowns.append(Unknown("P", pres_family))
        asm = Assembler(mesh, unknowns, quad_order="fifth")
        self.asm = asm
        grav = tuple(gravity[:dim])

        # fluid everywhere: transient NS, backward Euler
        ns = navier_stokes(vel=tuple(vel_names), pres="P",
                           vel_family=vel_family, pres_family=pres_family,
                           nu=mu_f / rho_f)

        def form(ops, u, aux):
            out = ns(ops, u, aux)
            dtv = aux["dt"]
            for d, vn in enumerate(vel_names):
                vh = ops.value(vel_family, u[vn])
                vo = ops.value(vel_family, aux[vn + "_old"])
                inertia = ops.t(vel_family, (vh - vo) / dtv)
                body = ops.t(vel_family,
                             -jnp.full_like(vh, grav[d]))
                out[vn] = out[vn] + inertia + body
            return out

        asm.set_volume_form(form)
        for vn in vel_names:
            asm.add_aux_field(vn + "_old", vel_family)

        nd_v = mesh.dofmap(vel_family).conn.shape[1]
        eye = jnp.eye(dim)

        def particle_form(u, p, aux):
            """One particle's contribution to its owner element's rows."""
            dtv = aux["dt"]
            phi, gphi = p["phi"], p["gphi"]          # (nd_v,), (nd_v, dim)
            vel = jnp.stack([phi @ u[vn] for vn in vel_names])      # (dim,)
            L = jnp.stack([gphi.T @ u[vn] for vn in vel_names])     # (dim, dim)
            F_new = (eye + dtv * L) @ p["F"]
            sig = solid_stress(F_new)                # Cauchy (dim, dim)
            vol = p["vol0"] * jnp.linalg.det(F_new)
            dm = p["mass"] - rho_f * p["vol0"] * jnp.linalg.det(p["F"])
            out = {}
            # the fluid form is kinematic (divided by rho_f), so the
            # particle terms are scaled by 1/rho_f for consistency
            for d, vn in enumerate(vel_names):
                inertia = dm * (vel[d] - p["v_old"][d]) / dtv * phi
                stress_t = vol * (gphi @ sig[d])
                body = -dm * grav[d] * phi
                out[vn] = (inertia + stress_t + body) / rho_f
            return out

        asm.set_particle_form(
            particle_form, ["phi", "gphi", "F", "vol0", "mass", "v_old"])
        generate_bdc(asm, bc_fn)
        if pin_pressure:
            # closed-cavity pressure null space: fix one pressure dof
            # (reference FixSolutionAtOnePoint, MultiLevelSolution.hpp:492)
            m = asm.dirichlet_mask[:asm.n_dofs].copy()
            v = asm.dirichlet_values[:asm.n_dofs].copy()
            m[asm.offsets["P"]] = True
            v[asm.offsets["P"]] = 0.0
            asm.set_dirichlet(m, v)

        self._assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
        self._tables = asm.device_tables()

        # particle shape evaluation + relocation (marker machinery)
        g = GEOMS[mesh.geom]
        conn_geo, coords, neigh = _geo_tables(mesh, jnp.float64)
        self._vconn = jnp.asarray(mesh.dofmap(vel_family).conn)
        vb = get_basis(mesh.geom, vel_family)
        gb = get_basis(mesh.geom, "biquadratic")
        center = jnp.asarray(g.center)
        viol = _FACE_VIOLATION[mesh.geom]

        def shape_at(xp, e):
            ce = coords[conn_geo[e]]
            xi = _inverse_newton(mesh.geom, ce, xp, center)
            phi = vb.eval(xi[None, :], jnp)[0]
            dphi = vb.eval_grad(xi[None, :], jnp)[0]
            Jg = gb.eval_grad(xi[None, :], jnp)[0].T @ ce
            return phi, dphi @ jnp.linalg.inv(Jg)

        self._shape_at = jax.jit(jax.vmap(shape_at))

        def relocate(xp, e):
            def body(carry, _):
                e, done = carry
                ce = coords[conn_geo[e]]
                xi = _inverse_newton(mesh.geom, ce, xp, center)
                v = viol(xi)
                inside = jnp.max(v) < 1e-9
                nxt = neigh[e, jnp.argmax(v)]
                e_new = jnp.where(inside | done, e,
                                  jnp.where(nxt < 0, e, nxt))
                return (e_new, done | inside), None
            (e, _), _ = jax.lax.scan(body, (e, e != e), None, length=4)
            return e

        self._relocate = jax.jit(jax.vmap(relocate))

    # ------------------------------------------------------------------
    def newton_solve(self, u0: jnp.ndarray, tables: dict,
                     aux_fields: dict, aux_scalars: dict) -> jnp.ndarray:
        """Monolithic Newton with a direct solve (dense; test/demo scale).
        Production-scale runs plug the same assemble into the MG-Krylov
        stack (systems.System) — the particle tables ride along as jit
        arguments either way."""
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla
        u = u0
        for _ in range(self.newton_iters):
            R, data = self._assemble(u, tables, aux_fields, aux_scalars)
            r = np.asarray(R)
            if np.linalg.norm(r) < self.newton_tol:
                break
            pat = self.asm.pattern
            rows = np.repeat(np.arange(pat.n_rows), pat.width)
            A = sp.csr_matrix(
                (np.asarray(data).ravel(), (rows, pat.cols.ravel())),
                shape=(pat.n_rows, pat.n_rows))
            du = spla.spsolve(A.tocsc(), r)
            u = u - jnp.asarray(du)
        return u

    # ------------------------------------------------------------------
    def step(self, s: MPMState, u: jnp.ndarray) -> Tuple[MPMState, jnp.ndarray]:
        """One implicit time step: returns (particles, grid dof vector)."""
        dt = self.dt
        phi, gphi = self._shape_at(s.x, s.elem)
        payload = {"phi": phi, "gphi": gphi, "F": s.F, "vol0": s.vol0,
                   "mass": s.mass, "v_old": s.v}
        tables = dict(self._tables)
        tables["particles"] = self.asm.particle_tables(
            np.asarray(s.elem), payload, self.ppe)
        aux_fields = {}
        for d, vn in enumerate(self.vel_names):
            sl = self.asm.offsets[vn]
            nd = self.asm.dofmaps[vn].n_dofs
            aux_fields[vn + "_old"] = u[sl:sl + nd]
        aux_scalars = {"dt": jnp.asarray(float(dt))}

        # apply Dirichlet values into the iterate, then Newton
        u0 = jnp.where(jnp.asarray(self.asm.dirichlet_mask),
                       jnp.asarray(self.asm.dirichlet_values), u)
        u_new = self.newton_solve(u0, tables, aux_fields, aux_scalars)

        # ---- G2P -------------------------------------------------------
        vconn = self._vconn[s.elem]                     # (np_, nd_v)
        vel_new, vel_old, Lp = [], [], []
        for vn in self.vel_names:
            sl = self.asm.offsets[vn]
            nd = self.asm.dofmaps[vn].n_dofs
            un = u_new[sl:sl + nd]
            uo = u[sl:sl + nd]
            vel_new.append(jnp.einsum("pn,pn->p", phi, un[vconn]))
            vel_old.append(jnp.einsum("pn,pn->p", phi, uo[vconn]))
            Lp.append(jnp.einsum("pnd,pn->pd", gphi, un[vconn]))
        v_grid = jnp.stack(vel_new, axis=1)              # (np_, dim)
        v_grid_old = jnp.stack(vel_old, axis=1)
        L = jnp.stack(Lp, axis=1)                        # (np_, dim, dim)
        v_p = (self.flip * (s.v + v_grid - v_grid_old)
               + (1 - self.flip) * v_grid)
        x_p = s.x + dt * v_grid
        I = jnp.eye(self.dim, dtype=s.F.dtype)
        F_p = (I[None] + dt * L) @ s.F
        e_p = self._relocate(x_p, s.elem)
        return (MPMState(x=x_p, v=v_p, F=F_p, mass=s.mass, vol0=s.vol0,
                         elem=e_p), u_new)
