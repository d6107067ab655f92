"""Krylov solvers: CG, GMRES(restart), Richardson — jit-native.

Replaces the reference's PETSc KSP layer (LinearEquationSolverPetsc.cpp:
294-353 MGSolve; KSP types GMRES/Richardson/preonly).  Design points:

- everything runs under jit with static iteration bounds + ``lax.while_loop``
  early exit — no host round-trips per iteration;
- GMRES uses CGS2 (classical Gram-Schmidt twice) so the number of global
  reductions per iteration stays at 2 regardless of basis size
  (SURVEY.md §7 hard part 2) — reductions become ``psum`` when sharded;
- operators are closures ``A(x) -> y`` so assembled SpMV, matrix-free
  element action, and MG preconditioners compose freely.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class SolveInfo(NamedTuple):
    iters: jnp.ndarray
    residual: jnp.ndarray


def cg(A: Callable, b: jnp.ndarray, x0=None, M: Optional[Callable] = None,
       tol: float = 1e-10, atol: float = 0.0, maxiter: int = 1000):
    """Preconditioned conjugate gradient.  Returns (x, SolveInfo)."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = M or (lambda r: r)
    r0 = b - A(x0)
    z0 = M(r0)
    bnorm = jnp.linalg.norm(b)
    target = jnp.maximum(tol * bnorm, atol)

    def cond(state):
        x, r, z, p, rz, k = state
        return (jnp.linalg.norm(r) > target) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = A(p)
        alpha = rz / (p @ Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = r @ z
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    init = (x0, r0, z0, z0, r0 @ z0, jnp.array(0))
    x, r, *_, k = jax.lax.while_loop(cond, body, init)
    return x, SolveInfo(k, jnp.linalg.norm(r))


def _givens(a, b):
    """Stable Givens rotation (c, s) with c*a + s*b = r, -s*a + c*b = 0."""
    h = jnp.hypot(a, b)
    hs = jnp.where(h == 0, 1.0, h)
    return jnp.where(h == 0, 1.0, a / hs), jnp.where(h == 0, 0.0, b / hs)


def _gmres_core(opM, opA, b, x0, M, tol, atol, restart, max_restarts,
                flexible: bool):
    """Shared GMRES driver: Givens-rotated Hessenberg with per-iteration
    residual tracking and ``lax.while_loop`` early exit at BOTH loop levels —
    unlike a fixed ``scan``, a cycle that converges at iteration j stops
    paying for preconditioner/operator applications past j.  CGS2
    orthogonalization keeps global reductions at 2 per iteration
    (SURVEY.md §7 hard part 2).

    flexible=False: left-preconditioned (solves M A x = M b).
    flexible=True: right-preconditioned FGMRES storing the Z basis.
    """
    n = b.shape[0]
    dtype = b.dtype
    m = restart

    def resid(x):
        return opM(b - opA(x))

    r0 = resid(x0)
    target = jnp.maximum(tol * jnp.linalg.norm(opM(b)), atol)

    def cycle(x, total):
        r = resid(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dtype).at[0].set(
            r / jnp.where(beta == 0, 1.0, beta))
        Z = jnp.zeros((m, n), dtype) if flexible else None
        H = jnp.zeros((m + 1, m), dtype)       # Givens-rotated in place
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def inner_cond(st):
            V, Z, H, cs, sn, g, j = st
            return (j < m) & (jnp.abs(g[j]) > target)

        def inner_body(st):
            V, Z, H, cs, sn, g, j = st
            if flexible:
                z = M(V[j])
                w = opA(z)
                Z2 = Z.at[j].set(z)
            else:
                w = opM(opA(V[j]))
                Z2 = Z
            # CGS2: rows of V past j are zero, so they contribute nothing
            h1 = V @ w
            w = w - V.T @ h1
            h2 = V @ w
            w = w - V.T @ h2
            h = h1 + h2
            wnorm = jnp.linalg.norm(w)
            V2 = V.at[j + 1].set(w / jnp.where(wnorm == 0, 1.0, wnorm))
            # apply previous rotations to the new column
            def rot(i, col):
                hi = cs[i] * col[i] + sn[i] * col[i + 1]
                hip = -sn[i] * col[i] + cs[i] * col[i + 1]
                return col.at[i].set(hi).at[i + 1].set(hip)
            col = h.at[j + 1].set(wnorm)
            col = jax.lax.fori_loop(0, j, rot, col)
            c, s = _givens(col[j], col[j + 1])
            col = col.at[j].set(c * col[j] + s * col[j + 1]).at[j + 1].set(0.0)
            g2 = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
            H2 = H.at[:, j].set(col)
            return (V2, Z2, H2, cs.at[j].set(c), sn.at[j].set(s), g2, j + 1)

        V, Z, H, cs, sn, g, j = jax.lax.while_loop(
            inner_cond, inner_body,
            (V, Z, H, cs, sn, g, jnp.array(0)))
        # back-substitute on the j leading columns (unused columns get unit
        # diagonal and zero rhs so they contribute y=0)
        lanes = jnp.arange(m)
        R = H[:m, :] + jnp.where(lanes >= j, 1.0, 0.0) * jnp.eye(m, dtype=dtype)
        rhs = jnp.where(lanes < j, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(R, rhs, lower=False)
        basis = Z if flexible else V[:m]
        return x + basis.T @ y, total + j, jnp.abs(g[j])

    def outer_cond(st):
        x, k, total, res = st
        return (res > target) & (k < max_restarts)

    def outer_body(st):
        x, k, total, res = st
        x, total, res = cycle(x, total)
        return x, k + 1, total, res

    x, k, total, res = jax.lax.while_loop(
        outer_cond, outer_body,
        (x0, jnp.array(0), jnp.array(0), jnp.linalg.norm(r0)))
    return x, SolveInfo(total, jnp.linalg.norm(resid(x)))


def gmres(A: Callable, b: jnp.ndarray, x0=None, M: Optional[Callable] = None,
          tol: float = 1e-10, atol: float = 0.0, restart: int = 30,
          max_restarts: int = 20):
    """Restarted GMRES(m), left-preconditioned (solves M A x = M b), CGS2
    orthogonalization, Givens-rotation residual tracking with early exit."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = M or (lambda r: r)
    return _gmres_core(M, A, b, x0, M, tol, atol, restart, max_restarts,
                       flexible=False)


def fgmres(A: Callable, b: jnp.ndarray, x0=None, M: Optional[Callable] = None,
           tol: float = 1e-10, atol: float = 0.0, restart: int = 30,
           max_restarts: int = 20):
    """Flexible GMRES (right preconditioning, Saad 1993): tolerates
    nonlinear/varying preconditioners (inner Krylov solves, Schur field-split
    with inner CG) by storing the preconditioned basis Z."""
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = M or (lambda r: r)
    return _gmres_core(lambda r: r, A, b, x0, M, tol, atol, restart,
                       max_restarts, flexible=True)


def richardson(A: Callable, b: jnp.ndarray, x0=None, M: Optional[Callable] = None,
               scale: float = 1.0, iters: int = 10):
    """Fixed-iteration preconditioned Richardson: x += scale * M(b - A x).

    The reference's smoother default (Richardson + scale 1.0 wrapping a PC,
    LinearEquationSolverPetsc.cpp:245-248)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    M = M or (lambda r: r)

    def body(x, _):
        return x + scale * M(b - A(x)), None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x
