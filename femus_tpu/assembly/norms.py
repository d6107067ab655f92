"""Error norms and functional integrals over a mesh.

Backs the FE-convergence harness (reference FE_convergence.hpp:29-139:
per-unknown L2/H1 error norms vs analytic solution or vs finer level).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fe.geom import GEOMS
from ..fe.tabulate import tabulate
from ..fe.quadrature import gauss
from .engine import GEO_FAMILY


def _setup(mesh, family, quad_order, dtype):
    g = GEOMS[mesh.geom]
    tg = tabulate(mesh.geom, GEO_FAMILY, quad_order)
    tf = tabulate(mesh.geom, family, quad_order)
    geo_conn = mesh.conn[:, g.family_nodes[GEO_FAMILY]]
    coords_e = jnp.asarray(mesh.coords[geo_conn], dtype)
    conn = jnp.asarray(mesh.dofmap(family).conn)
    return (jnp.asarray(tg.phi, dtype), jnp.asarray(tg.dphi, dtype),
            jnp.asarray(tf.phi, dtype), jnp.asarray(tf.dphi, dtype),
            jnp.asarray(tg.weights, dtype), coords_e, conn)


def error_norms(mesh, family: str, u, exact: Callable,
                exact_grad: Optional[Callable] = None,
                quad_order="ninth") -> Tuple[float, float]:
    """(L2 error, H1-seminorm error) of the FE function vs an analytic field.

    exact(x: (nq, dim)) -> (nq,); exact_grad(x) -> (nq, dim).
    """
    dtype = jnp.asarray(u).dtype
    gphi, gdphi, fphi, fdphi, w, coords_e, conn = _setup(mesh, family, quad_order, dtype)
    u = jnp.asarray(u)

    def one(ul, cl):
        J = jnp.einsum("qnd,nx->qdx", gdphi, cl)
        if cl.shape[-1] == J.shape[1]:
            wdet = w * jnp.abs(jnp.linalg.det(J))
            invJT = jnp.swapaxes(jnp.linalg.inv(J), 1, 2)   # (nq, d, x)
        else:
            # embedded manifold: area element + tangential gradients
            G = jnp.einsum("qdx,qex->qde", J, J)
            wdet = w * jnp.sqrt(jnp.linalg.det(G))
            invJT = jnp.einsum("qde,qex->qdx", jnp.linalg.inv(G), J)
        xq = gphi @ cl
        uh = fphi @ ul
        e2 = ((uh - exact(xq)) ** 2 * wdet).sum()
        h2 = 0.0
        if exact_grad is not None:
            dphi = jnp.einsum("qnd,qdx->qnx", fdphi, invJT)
            gh = jnp.einsum("qnx,n->qx", dphi, ul)
            h2 = (((gh - exact_grad(xq)) ** 2).sum(axis=-1) * wdet).sum()
        return e2, h2

    e2, h2 = jax.vmap(one)(u[conn], coords_e)
    return float(jnp.sqrt(e2.sum())), float(jnp.sqrt(h2.sum()))


def _wdet(gdphi, w, cl):
    """Quadrature weights x volume (or manifold area) element."""
    J = jnp.einsum("qnd,nx->qdx", gdphi, cl)
    if cl.shape[-1] == J.shape[1]:
        return w * jnp.abs(jnp.linalg.det(J))
    G = jnp.einsum("qdx,qex->qde", J, J)
    return w * jnp.sqrt(jnp.linalg.det(G))


def l2_norm_field(mesh, family: str, u, quad_order="ninth") -> float:
    """Integral L2 norm of the FE function itself."""
    z, _ = error_norms(mesh, family, u, lambda x: jnp.zeros(x.shape[0], u.dtype),
                       None, quad_order)
    return z


def integrate_field(mesh, family: str, u, quad_order="ninth") -> float:
    """integral of the FE function u over the mesh (e.g. total mass)."""
    dtype = jnp.asarray(u).dtype
    gphi, gdphi, fphi, _, w, coords_e, conn = _setup(mesh, family, quad_order,
                                                     dtype)
    u = jnp.asarray(u)

    def one(ul, cl):
        return ((fphi @ ul) * _wdet(gdphi, w, cl)).sum()

    return float(jax.vmap(one)(u[conn], coords_e).sum())


def integrate(mesh, fn: Callable, quad_order="ninth", dtype=jnp.float64) -> float:
    """integral of fn(x) over the mesh (host-facing convenience)."""
    g = GEOMS[mesh.geom]
    tg = tabulate(mesh.geom, GEO_FAMILY, quad_order)
    geo_conn = mesh.conn[:, g.family_nodes[GEO_FAMILY]]
    coords_e = jnp.asarray(mesh.coords[geo_conn], dtype)
    gphi = jnp.asarray(tg.phi, dtype)
    gdphi = jnp.asarray(tg.dphi, dtype)
    w = jnp.asarray(tg.weights, dtype)

    def one(cl):
        return (fn(gphi @ cl) * _wdet(gdphi, w, cl)).sum()

    return float(jax.vmap(one)(coords_e).sum())
