"""PDE-constrained optimal control.

Reference: src/09_optimal_control — ``cost_functional`` templates
(00_cost_functional.hpp:53: target misfit + alpha L2 + beta H1-seminorm
regularization, volume or boundary control) and
``NonLinearImplicitSystemWithPrimalDualActiveSetMethod``
(NonLinearImplicitSystemWithPrimalDualActiveSetMethod.hpp:35: PDAS for
inequality-constrained controls).

Here the first-order optimality (KKT) system of the elliptic
distributed-control problem

    min 1/2 ||y - y_d||^2 + alpha/2 ||u||^2 + beta/2 |u|_H1^2
    s.t. -div(kappa grad y) = u + f,   y = g on Gamma_D

is assembled monolithically (state y, adjoint l, control u) with the same
batched engine; box constraints u_a <= u <= u_b are enforced by a primal-dual
active-set outer loop that converts active control dofs into Dirichlet rows.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
import jax.numpy as jnp

from .system import NonLinearImplicitSystem
from .solution import DIRICHLET


def elliptic_control_form(state: str = "y", adj: str = "l", ctrl: str = "u",
                          family: str = "biquadratic",
                          y_target: Callable = None,
                          alpha: float = 1e-3, beta: float = 0.0,
                          kappa: float = 1.0,
                          rhs: Optional[Callable] = None):
    """KKT residuals: state rows (tested with adjoint), adjoint rows, gradient
    rows  alpha u + beta (-lap u) - l = 0."""

    def form(ops, u, aux):
        gy = ops.grad(family, u[state])
        gl = ops.grad(family, u[adj])
        yq = ops.value(family, u[state])
        lq = ops.value(family, u[adj])
        uq = ops.value(family, u[ctrl])
        yd = ops.pointwise(y_target)
        out = {}
        r_state = kappa * ops.tgrad(family, gy) - ops.t(family, uq)
        if rhs is not None:
            r_state = r_state - ops.t(family, ops.pointwise(rhs))
        out[state] = r_state
        out[adj] = kappa * ops.tgrad(family, gl) + ops.t(family, yq - yd)
        r_ctrl = alpha * ops.t(family, uq) - ops.t(family, lq)
        if beta:
            gu = ops.grad(family, u[ctrl])
            r_ctrl = r_ctrl + beta * ops.tgrad(family, gu)
        out[ctrl] = r_ctrl
        return out

    return form


def boundary_control_forms(state: str = "y", adj: str = "l", ctrl: str = "u",
                           family: str = "biquadratic",
                           y_target: Callable = None,
                           alpha: float = 1e-3, kappa: float = 1.0,
                           control_groups=(), obs_groups=None,
                           boundary_target: Optional[Callable] = None,
                           rhs: Optional[Callable] = None):
    """Neumann BOUNDARY control (reference 00_cost_functional.hpp:27-53
    boundary target/regularization integrals; 010_OptimalControl Neumann
    variants):

        min 1/2||y - y_d||^2_Omega [+ 1/2||y - y_db||^2_Gobs]
            + alpha/2 ||u||^2_{L2(Gc)}
        s.t. -div(kappa grad y) = f,   kappa dy/dn = u on Gc.

    KKT rows: state/adjoint volume rows as in the distributed case minus
    the volume control source; face rows on the control groups inject the
    Neumann control into the state equation and impose the boundary
    gradient condition alpha u - l = 0 on Gc.  The control variable only
    carries meaning on Gc — eliminate its interior dofs with
    :func:`fix_interior_control`.

    Returns (volume_form, face_form) for ``System.set_assembly``.
    """

    def vol(ops, u, aux):
        gy = ops.grad(family, u[state])
        gl = ops.grad(family, u[adj])
        yq = ops.value(family, u[state])
        yd = ops.pointwise(y_target)
        out = {}
        r_state = kappa * ops.tgrad(family, gy)
        if rhs is not None:
            r_state = r_state - ops.t(family, ops.pointwise(rhs))
        out[state] = r_state
        out[adj] = kappa * ops.tgrad(family, gl) + ops.t(family, yq - yd)
        return out

    def face(fops, u, fams, grp, aux):
        uq = fops.value(family, u[ctrl])
        lq = fops.value(family, u[adj])
        sel = sum((grp == g).astype(uq.dtype) for g in control_groups)
        out = {state: -fops.t(family, uq * sel),
               ctrl: fops.t(family, (alpha * uq - lq) * sel)}
        if obs_groups and boundary_target is not None:
            yq = fops.value(family, u[state])
            ydb = boundary_target(fops.x)
            selo = sum((grp == g).astype(uq.dtype) for g in obs_groups)
            out[adj] = fops.t(family, (yq - ydb) * selo)
        return out

    return vol, face


def fix_interior_control(system, ctrl: str, control_groups,
                         level: int = -1) -> None:
    """Dirichlet-eliminate control dofs NOT on the control boundary (they
    carry no equation in the boundary-control KKT system) on every level."""
    for l, a in enumerate(system.assemblers):
        mesh = a.mesh
        dm = a.dofmaps[ctrl]
        on_gc = np.zeros(dm.n_dofs, bool)
        for bf in mesh.boundary.values():
            for r in range(len(bf.elem)):
                if int(bf.group[r]) in control_groups:
                    d = dm.node_to_dof[bf.conn[r]]
                    on_gc[d[d >= 0]] = True
        mask = a.dirichlet_mask.copy()
        vals = a.dirichlet_values.copy()
        off = a.offsets[ctrl]
        mask[off:off + dm.n_dofs][~on_gc] = True
        vals[off:off + dm.n_dofs][~on_gc] = 0.0
        a.set_dirichlet(mask, vals)
        system.masks[l] = a.dirichlet_mask
    system._transfer_cache.clear()
    system._step_fns.clear()


def cost_functional(mesh, family: str, y, u, y_target: Callable,
                    alpha: float, beta: float = 0.0,
                    quad_order="ninth") -> float:
    """J = 1/2||y - y_d||^2 + alpha/2||u||^2 + beta/2|u|_H1^2 (reference
    00_cost_functional.hpp volume integrals)."""
    from ..assembly.norms import error_norms
    mis, _ = error_norms(mesh, family, jnp.asarray(y), y_target, None, quad_order)
    ul2, uh1 = error_norms(mesh, family, jnp.asarray(u),
                           lambda x: jnp.zeros(x.shape[0]),
                           (lambda x: jnp.zeros(x.shape)) if beta else None,
                           quad_order)
    return 0.5 * mis ** 2 + 0.5 * alpha * ul2 ** 2 + 0.5 * beta * uh1 ** 2


class PDASControlSystem(NonLinearImplicitSystem):
    """Primal-dual active-set outer loop around the KKT solve.

    Active sets (Bergounioux-Ito-Kunisch):  with multiplier mu = l - alpha u,
      A+ = { mu + c (u - ub) > 0 },  A- = { mu + c (u - ua) < 0 };
    active control dofs become Dirichlet rows at the bound value; iterate
    until the active sets stop changing (reference
    NonLinearImplicitSystemWithPrimalDualActiveSetMethod::MGsolve)."""

    def set_control_bounds(self, ctrl: str, ua: float, ub: float,
                           c: float = 1.0, alpha: float = 1e-3,
                           adj: str = "l"):
        self._pdas = dict(ctrl=ctrl, ua=ua, ub=ub, c=c, alpha=alpha, adj=adj)

    def solve_pdas(self, max_iters: int = 20) -> Dict:
        p = self._pdas
        ctrl, adj = p["ctrl"], p["adj"]
        l = len(self.ml_mesh.levels) - 1
        a = self.assemblers[l]
        off = a.offsets[ctrl]
        nd = self.ml_sol.n_dofs(ctrl, l)
        base_mask = a.dirichlet_mask.copy()
        base_vals = a.dirichlet_values.copy()
        active_prev = None
        info = {}
        for it in range(max_iters):
            out = super().solve()
            u = self.ml_sol.sol[l][ctrl]
            lam = self.ml_sol.sol[l][adj]
            mu = lam - p["alpha"] * u
            act_hi = mu + p["c"] * (u - p["ub"]) > 0
            act_lo = mu + p["c"] * (u - p["ua"]) < 0
            key = (act_hi.tobytes(), act_lo.tobytes())
            changed = key != active_prev
            info = {"pdas_iters": it + 1, "active_hi": int(act_hi.sum()),
                    "active_lo": int(act_lo.sum()), **out}
            if not changed:
                break
            active_prev = key
            mask = base_mask.copy()
            vals = base_vals.copy()
            mask[off:off + nd][act_hi | act_lo] = True
            vals[off:off + nd][act_hi] = p["ub"]
            vals[off:off + nd][act_lo] = p["ua"]
            a.set_dirichlet(mask[:a.n_dofs], vals[:a.n_dofs])
            u[act_hi] = p["ub"]
            u[act_lo] = p["ua"]
            # refresh the jitted step (mask is a traced table -> no recompile)
        return info
