"""Monolithic fluid-structure interaction.

Reference: ``MonolithicFSINonLinearImplicitSystem``
(MonolithicFSINonLinearImplicitSystem.hpp:35 — FSI-aware prolongator with
fluid/solid block pairing :83-101, material-split ASM blocks :70-75) and the
FSI assembly apps (005_FSI; steady gate unittests/testFSISteady).

Formulation (steady, monolithic ALE): unknowns displacement d, velocity U,
pressure p over the whole domain; per-element material from
``mesh.elem_group``:

- fluid elements: NS momentum + continuity on the *displaced* configuration
  (ElemOps.moved differentiates geometry through jacfwd, the analogue of the
  reference's adouble moving coordinates); mesh motion by harmonic extension
  of d on the reference configuration.
- solid elements: nonlinear elasticity residual P(F(d)) : grad(phi) tested
  with the velocity test functions (traction balance at the interface comes
  from the shared test space); kinematic rows tie U = 0 (steady); pressure
  rows give p = 0 (compressible solid) or J - 1 = 0 (incompressible).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from ..assembly import tensors

from .system import NonLinearImplicitSystem
from .transient import _TransientMixin


def fsi_steady_form(disp=("dx", "dy"), vel=("u", "v"), pres: str = "p",
                    solid_groups: Sequence[int] = (1,),
                    disp_family: str = "biquadratic",
                    vel_family: str = "biquadratic", pres_family: str = "linear",
                    nu: float = 1.0, lam: float = 1.0, mu: float = 1.0,
                    solid_model: str = "neo-hookean",
                    kappa_mesh: float = 1.0,
                    force: Optional[Callable] = None,
                    incompressible_solid: bool = False):
    dim = len(disp)
    solid_groups = tuple(int(g) for g in solid_groups)

    def form(ops, u, aux):
        grp = aux["group"]
        is_solid = jnp.zeros((), bool)
        for g in solid_groups:
            is_solid = is_solid | (grp == g)
        w_s = jnp.where(is_solid, 1.0, 0.0)
        w_f = 1.0 - w_s

        d_nodes = jnp.stack([u[c] for c in disp], axis=1)  # (nd_geo_fam, dim[, ne])
        # displacement lives on the geometry family -> usable to move the mesh
        mops = ops.moved(d_nodes)

        G = jnp.stack([ops.grad(disp_family, u[c]) for c in disp], axis=1)
        I = tensors.eye_like(dim, G)
        out = {}

        # ---- fluid: NS on moved configuration --------------------------
        Vq = [mops.value(vel_family, u[c]) for c in vel]
        Gv = [mops.grad(vel_family, u[c]) for c in vel]
        pq = mops.value(pres_family, u[pres])
        fq = mops.pointwise(force) if force is not None else None

        # ---- solid: total-Lagrangian stress on reference config --------
        F = I + G
        if solid_model == "saint-venant":
            E = 0.5 * (tensors.matTmul(F, F) - I)
            S = 2 * mu * E + lam * tensors.qpm(tensors.trace(E)) * I
            P = tensors.matmul(F, S)
        else:  # neo-hookean
            J = tensors.det(F)
            FinvT = tensors.transpose(tensors.inv(F))
            P = mu * (F - FinvT) + lam * tensors.qpm(jnp.log(J)) * FinvT
        if incompressible_solid:
            Js = tensors.det(F)
            FinvT = tensors.transpose(tensors.inv(F))
            ps = ops.value(pres_family, u[pres])
            P = P - tensors.qpm(ps * Js) * FinvT

        for c_i, c in enumerate(vel):
            # fluid momentum (moved config)
            adv = sum(Vq[e] * Gv[c_i][:, e] for e in range(dim))
            rf = (nu * mops.tgrad(vel_family, Gv[c_i])
                  + mops.t(vel_family, adv)
                  - mops.tgrad_d(vel_family, pq, c_i))
            if fq is not None:
                rf = rf - mops.t(vel_family, fq[:, c_i])
            # solid momentum (elasticity tested with velocity tests)
            rs = ops.tgrad(vel_family, P[:, c_i, :])
            out[c] = w_f * rf + w_s * rs

        # continuity / solid pressure
        divV = sum(Gv[e][:, e] for e in range(dim))
        if incompressible_solid:
            Js = tensors.det(F)
            rs_p = ops.t(pres_family, Js - 1.0)
        else:
            rs_p = ops.t(pres_family, ops.value(pres_family, u[pres]))
        out[pres] = w_f * (-mops.t(pres_family, divV)) + w_s * rs_p

        # displacement rows: fluid mesh harmonic extension / solid kinematics
        for c_i, c in enumerate(disp):
            r_mesh = kappa_mesh * ops.tgrad(disp_family, G[:, c_i, :])
            r_kin = ops.t(disp_family, ops.value(vel_family, u[vel[c_i]]))
            out[c] = w_f * r_mesh + w_s * r_kin
        return out

    return form


class MonolithicFSISystem(NonLinearImplicitSystem):
    """Nonlinear monolithic FSI system (steady) with the FSI-specific
    Petrov-Galerkin transfer path (reference
    ``MonolithicFSINonLinearImplicitSystem::BuildProlongatorMatrix``,
    MonolithicFSINonLinearImplicitSystem.cpp:147-246): prolongation P stays
    the plain block interpolant, but the restriction ``_RR`` routes
    interface-crossing entries between paired variables (``PairSolution``,
    e.g. U->DX) or drops them (self-paired DX/DY), and coarse operators are
    the non-symmetric triple product ``R A P`` (matrix_ABC,
    LinearImplicitSystem.cpp:348-352) instead of Galerkin PtAP.

    ``solid_groups`` (element groups carrying the solid material, reference
    material flag 4) must be set before ``init()``; pairs come from
    ``ml_sol.pair_solution``.  Material-split smoother blocks come from
    algebra.vanka.build_element_blocks over the partition-ordered elements
    (cfg.vanka_groups = "material")."""

    solid_groups: Sequence[int] = ()

    def _make_transfer_pair(self, l: int):
        from ..algebra.transfer import fsi_restriction_transpose
        P, _ = super()._make_transfer_pair(l)
        if not self.solid_groups and not self.ml_sol.pairs:
            return P, None
        RRt = fsi_restriction_transpose(
            self.ml_mesh.levels[l], self.ml_mesh.levels[l + 1],
            self.unknowns, self.ml_sol.pairs, self.solid_groups)
        return P, RRt.T.tocsr()


def fsi_transient_form(disp=("dx", "dy"), vel=("u", "v"), pres: str = "p",
                       solid_groups: Sequence[int] = (1,),
                       disp_family: str = "biquadratic",
                       vel_family: str = "biquadratic",
                       pres_family: str = "linear",
                       rho_f: float = 1.0, nu: float = 1.0,
                       rho_s: float = 1.0, lam: float = 1.0, mu: float = 1.0,
                       solid_model: str = "neo-hookean",
                       kappa_mesh: float = 1.0,
                       force: Optional[Callable] = None,
                       incompressible_solid: bool = False,
                       theta: float = 1.0):
    """Time-dependent monolithic ALE FSI residual.

    Reference: the transient FSI apps driven by
    ``TransientNonlinearImplicitSystem`` over the FSI assembly
    (src/08_fsi; unittests time-dependent FSI tutorials), i.e. the moving-
    domain analogue of :func:`fsi_steady_form`:

    - fluid (moved configuration, ALE): rho_f [ (U - U_old)/dt
      + (U - w) . grad U ] with mesh velocity w = (d - d_old)/dt interpolated
      at quadrature points, plus viscous/pressure terms; continuity on the
      moved configuration.
    - solid (total Lagrangian, reference configuration): momentum
      rho_s (U - U_old)/dt + div P(F(d)); kinematic row (d - d_old)/dt = U
      replaces the steady row U = 0.
    - fluid displacement row: harmonic extension of d (as steady).

    ``theta`` blends the fluid viscous/advective terms between the new and
    old velocity states evaluated on the NEW configuration (theta = 1 is
    backward Euler, 0.5 a Crank-Nicolson-like scheme; pressure and
    continuity stay fully implicit, as the reference does for the algebraic
    rows).  The form expects aux '<var>_old' element-local fields for every
    displacement and velocity component and the scalar aux 'dt' (provided by
    ``_TransientMixin.init_time`` when the variables carry time_order=1).
    """
    dim = len(disp)
    solid_groups = tuple(int(g) for g in solid_groups)

    def form(ops, u, aux):
        dt = aux["dt"]
        grp = aux["group"]
        is_solid = jnp.zeros((), bool)
        for g in solid_groups:
            is_solid = is_solid | (grp == g)
        w_s = jnp.where(is_solid, 1.0, 0.0)
        w_f = 1.0 - w_s

        d_nodes = jnp.stack([u[c] for c in disp], axis=1)
        mops = ops.moved(d_nodes)

        G = jnp.stack([ops.grad(disp_family, u[c]) for c in disp], axis=1)
        I = tensors.eye_like(dim, G)
        out = {}

        # ---- fluid: ALE NS on the moved configuration -------------------
        Vq = [mops.value(vel_family, u[c]) for c in vel]
        Voq = [mops.value(vel_family, aux[c + "_old"]) for c in vel]
        Gv = [mops.grad(vel_family, u[c]) for c in vel]
        Gvo = ([mops.grad(vel_family, aux[c + "_old"]) for c in vel]
               if theta < 1.0 else None)
        pq = mops.value(pres_family, u[pres])
        fq = mops.pointwise(force) if force is not None else None
        # mesh velocity at quadrature points (ALE convective correction)
        wq = [(mops.value(disp_family, u[c])
               - mops.value(disp_family, aux[c + "_old"])) / dt for c in disp]

        # ---- solid: total-Lagrangian stress on reference config ---------
        F = I + G
        if solid_model == "saint-venant":
            E = 0.5 * (tensors.matTmul(F, F) - I)
            S = 2 * mu * E + lam * tensors.qpm(tensors.trace(E)) * I
            P = tensors.matmul(F, S)
        else:  # neo-hookean
            J = tensors.det(F)
            FinvT = tensors.transpose(tensors.inv(F))
            P = mu * (F - FinvT) + lam * tensors.qpm(jnp.log(J)) * FinvT
        if incompressible_solid:
            Js = tensors.det(F)
            FinvT = tensors.transpose(tensors.inv(F))
            ps = ops.value(pres_family, u[pres])
            P = P - tensors.qpm(ps * Js) * FinvT

        for c_i, c in enumerate(vel):
            dudt = (Vq[c_i] - Voq[c_i]) / dt
            adv = sum((Vq[e] - wq[e]) * Gv[c_i][:, e] for e in range(dim))
            spat = (nu * mops.tgrad(vel_family, Gv[c_i])
                    + rho_f * mops.t(vel_family, adv))
            if theta < 1.0:
                adv_o = sum((Voq[e] - wq[e]) * Gvo[c_i][:, e]
                            for e in range(dim))
                spat_o = (nu * mops.tgrad(vel_family, Gvo[c_i])
                          + rho_f * mops.t(vel_family, adv_o))
                spat = theta * spat + (1.0 - theta) * spat_o
            rf = (rho_f * mops.t(vel_family, dudt) + spat
                  - mops.tgrad_d(vel_family, pq, c_i))
            if fq is not None:
                rf = rf - mops.t(vel_family, fq[:, c_i])
            # solid momentum: rho_s dU/dt + div P (reference configuration)
            Uq = ops.value(vel_family, u[c])
            Uoq = ops.value(vel_family, aux[c + "_old"])
            rs = (rho_s * ops.t(vel_family, (Uq - Uoq) / dt)
                  + ops.tgrad(vel_family, P[:, c_i, :]))
            out[c] = w_f * rf + w_s * rs

        # continuity / solid pressure (fully implicit)
        divV = sum(Gv[e][:, e] for e in range(dim))
        if incompressible_solid:
            Js = tensors.det(F)
            rs_p = ops.t(pres_family, Js - 1.0)
        else:
            rs_p = ops.t(pres_family, ops.value(pres_family, u[pres]))
        out[pres] = w_f * (-mops.t(pres_family, divV)) + w_s * rs_p

        # displacement rows: fluid harmonic extension / solid kinematics
        for c_i, c in enumerate(disp):
            r_mesh = kappa_mesh * ops.tgrad(disp_family, G[:, c_i, :])
            dq = ops.value(disp_family, u[c])
            doq = ops.value(disp_family, aux[c + "_old"])
            Uq = ops.value(vel_family, u[vel[c_i]])
            r_kin = ops.t(disp_family, (dq - doq) / dt - Uq)
            out[c] = w_f * r_mesh + w_s * r_kin
        return out

    return form


class TransientMonolithicFSI(_TransientMixin, MonolithicFSISystem):
    """Time-dependent monolithic FSI (reference: transient FSI apps built on
    TransientSystem<MonolithicFSINonLinearImplicitSystem>, src/08_fsi).
    Drive with init_time(dt) + time_step(); displacement and velocity
    unknowns must carry time_order=1 so the mixin wires the '<var>_old'
    element-local aux fields that :func:`fsi_transient_form` reads."""
    pass
