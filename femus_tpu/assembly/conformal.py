"""Conformal-minimization of surface parameterizations.

Reference: applications/Conformal (AssembleConformalMinimization,
ex1.cpp:183-530) — reparameterize a (possibly embedded) surface
x = x_hat + Dx to minimize the conformal (Cauchy-Riemann defect) energy

  E = sum_q w_q ( |V|^2 + |W|^2 ),
  V_K = x_,v^K - (N x x_,u)^K,   W_K = x_,u^K + (N x x_,v)^K,

with N the unit surface normal from the current metric and the per-element
"equal weight trick" Area2 = w_q (ex1.cpp:398).  On a planar domain
(N = e_z, x3 = 0) the minimizers with analytic Dirichlet data are the
discrete Cauchy-Riemann (holomorphic) maps.

Unlike the reference, which hand-derives the Euler-Lagrange residual as a
Q-tensor contraction (ex1.cpp:437-462), the TPU form takes the residual as
the exact AD gradient of the discrete energy — the assembly engine then
forms the exact Hessian by jacfwd over it, so Newton is energy-consistent
by construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _ambient_position(ops, u, disp, family):
    nd = ops.coords.shape[0]
    dtype = ops.coords.dtype
    xhat = ops.coords                                     # (nd, sdim)
    sdim = xhat.shape[1]
    comps = []
    for K in range(3):
        base = xhat[:, K] if K < sdim else jnp.zeros(nd, dtype)
        dK = u[disp[K]] if K < len(disp) and disp[K] in u else 0.0
        comps.append(base + dK)
    return jnp.stack(comps, axis=-1)                      # (nd, 3)


def conformal_energy(ops, u, disp=("Dx1", "Dx2"), family="biquadratic",
                     normal=None):
    """Per-element conformal energy sum_q w_q (|V|^2 + |W|^2) (ex1.cpp:466)."""
    x = _ambient_position(ops, u, disp, family)
    dref = ops.dphi_ref(family)                           # (nq, nd, 2)
    x_uv = jnp.einsum("qnj,nK->qKj", dref, x)             # (nq, 3, 2)
    if normal is not None:
        N = jnp.broadcast_to(jnp.asarray(normal, x.dtype),
                             (x_uv.shape[0], 3))
    else:
        g = jnp.einsum("qKi,qKj->qij", x_uv, x_uv)
        detg = g[:, 0, 0] * g[:, 1, 1] - g[:, 0, 1] * g[:, 1, 0]
        N = jnp.cross(x_uv[:, :, 0], x_uv[:, :, 1]) / jnp.sqrt(detg)[:, None]
    V = x_uv[:, :, 1] - jnp.cross(N, x_uv[:, :, 0])
    W = x_uv[:, :, 0] + jnp.cross(N, x_uv[:, :, 1])
    return jnp.sum(ops.qweights * (jnp.sum(V * V, -1) + jnp.sum(W * W, -1)))


def conformal_minimization(disp=("Dx1", "Dx2", "Dx3"),
                           family: str = "biquadratic",
                           normal=None):
    """Weak form over ElemOps; unknowns = ambient displacement components of
    the surface position (pass 2 names on planar meshes: x3 = 0 frozen).

    normal: optional frozen unit normal (e.g. (0,0,1) on planar domains —
    the reference's planar mode, ex1.cpp:411-413).  With a frozen normal the
    energy is quadratic in the positions and Newton converges in one step;
    with normal=None the current-metric normal is used (fully nonlinear
    surface case, needs a near-conformal initial guess, which is how the
    reference employs it as a reparameterization pass)."""

    def form(ops, u, aux):
        names = [n for n in disp if n in u]

        def energy(vals):
            uu = {**u, **dict(zip(names, vals))}
            return conformal_energy(ops, uu, disp, family, normal)

        g = jax.grad(energy)([u[n] for n in names])
        return dict(zip(names, g))

    # grad-of-energy over per-element axis conventions: keep the vmapped
    # per-element assembly path (see Assembler.set_volume_form)
    form.layout = "batch_first"
    return form
