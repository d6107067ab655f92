"""Layout-agnostic small-tensor algebra for weak forms.

Forms see quadrature-point tensors in two layouts (assembly/engine.py):

- per-element (``ElemOps`` under vmap): scalars (nq,), vectors (nq, dim),
  matrices (nq, dim, dim);
- batched element-last (``ElemOpsBatched``, the TPU hot path): scalars
  (nq, ne), vectors (nq, dim, ne), matrices (nq, dim, dim, ne).

The helpers here put the matrix axes at positions (1, 2) and broadcast over
any trailing axes, so constitutive laws and geometric tensor algebra written
against them run unchanged in both layouts.  ``jnp.linalg`` wants matrix axes
LAST, which would force a relayout of the (lane-major) element axis — these
are explicit adjugate formulas for dim <= 3 instead, like
``engine._det_inv_batched`` does for the geometric Jacobian.
"""
from __future__ import annotations

import jax.numpy as jnp


def qp(s):
    """Broadcast a qp-scalar against a qp-vector: (nq[, ne]) -> (nq, 1[, ne])."""
    return jnp.expand_dims(s, 1)


def qpm(s):
    """Broadcast a qp-scalar against a qp-matrix: -> (nq, 1, 1[, ne])."""
    return jnp.expand_dims(s, (1, 2))


def vdot(a, b):
    """Dot product of qp-vectors over the dim axis: -> qp-scalar."""
    return jnp.sum(a * b, axis=1)


def eye_like(dim: int, T):
    """Identity broadcastable against a qp-matrix T of ndim 3 or 4."""
    return jnp.eye(dim, dtype=T.dtype).reshape(
        (1, dim, dim) + (1,) * (T.ndim - 3))


def transpose(F):
    return jnp.swapaxes(F, 1, 2)


def matmul(A, B):
    """A @ B over matrix axes (1, 2), broadcasting trailing axes."""
    return jnp.einsum("qik...,qkj...->qij...", A, B)


def matTmul(A, B):
    """A^T @ B over matrix axes (1, 2)."""
    return jnp.einsum("qki...,qkj...->qij...", A, B)


def matmulT(A, B):
    """A @ B^T over matrix axes (1, 2)."""
    return jnp.einsum("qik...,qjk...->qij...", A, B)


def matvec(A, v):
    """A @ v: qp-matrix times qp-vector -> qp-vector."""
    return jnp.einsum("qij...,qj...->qi...", A, v)


def trace(F):
    return jnp.trace(F, axis1=1, axis2=2)


def det(F):
    """Determinant over axes (1, 2) for dim 1/2/3, any trailing axes."""
    d = F.shape[1]
    if d == 1:
        return F[:, 0, 0]
    if d == 2:
        return F[:, 0, 0] * F[:, 1, 1] - F[:, 0, 1] * F[:, 1, 0]
    return (F[:, 0, 0] * (F[:, 1, 1] * F[:, 2, 2] - F[:, 1, 2] * F[:, 2, 1])
            - F[:, 0, 1] * (F[:, 1, 0] * F[:, 2, 2] - F[:, 1, 2] * F[:, 2, 0])
            + F[:, 0, 2] * (F[:, 1, 0] * F[:, 2, 1] - F[:, 1, 1] * F[:, 2, 0]))


def inv(F):
    """Inverse over axes (1, 2) via the adjugate, dim 1/2/3."""
    d = F.shape[1]
    detF = det(F)
    if d == 1:
        return 1.0 / qpm(detF) * jnp.ones_like(F)
    if d == 2:
        r0 = jnp.stack([F[:, 1, 1], -F[:, 0, 1]], axis=1)
        r1 = jnp.stack([-F[:, 1, 0], F[:, 0, 0]], axis=1)
        return jnp.stack([r0, r1], axis=1) / qpm(detF)
    c = [[(1, 1, 2, 2, 1, 2, 2, 1), (0, 2, 2, 1, 0, 1, 2, 2), (0, 1, 1, 2, 0, 2, 1, 1)],
         [(1, 2, 2, 0, 1, 0, 2, 2), (0, 0, 2, 2, 0, 2, 2, 0), (0, 2, 1, 0, 0, 0, 1, 2)],
         [(1, 0, 2, 1, 1, 1, 2, 0), (0, 1, 2, 0, 0, 0, 2, 1), (0, 0, 1, 1, 0, 1, 1, 0)]]
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            a, b_, cc, dd, e, f, g, h = c[i][j]
            cols.append(F[:, a, b_] * F[:, cc, dd] - F[:, e, f] * F[:, g, h])
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1) / qpm(detF)
