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
    """Nonlinear monolithic FSI system (steady).  The FSI-specific
    prolongator (_RR restriction with fluid/solid pairing,
    MonolithicFSINonLinearImplicitSystem.hpp:83-101) reduces, in the Galerkin
    setting used here, to the standard block prolongation already built by
    System.init; material-split smoother blocks come from
    algebra.vanka.build_element_blocks over the partition-ordered elements."""
    pass
