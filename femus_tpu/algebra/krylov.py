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


def gmres(A: Callable, b: jnp.ndarray, x0=None, M: Optional[Callable] = None,
          tol: float = 1e-10, atol: float = 0.0, restart: int = 30,
          max_restarts: int = 20):
    """Restarted GMRES(m) with CGS2 orthogonalization and left preconditioning.

    Solves M A x = M b.  Static shapes: the Krylov basis is (m+1, n); each
    cycle runs exactly m inner steps (lanes past convergence are masked), and
    the outer restart loop exits early via while_loop.
    """
    n = b.shape[0]
    dtype = b.dtype
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = M or (lambda r: r)
    m = restart
    Mb = M(b)
    bnorm = jnp.linalg.norm(Mb)
    target = jnp.maximum(tol * bnorm, atol)

    def cycle(x):
        r = M(b - A(x))
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dtype).at[0].set(r / jnp.where(beta == 0, 1.0, beta))
        H = jnp.zeros((m + 1, m), dtype)

        def arnoldi(carry, j):
            V, H = carry
            w = M(A(V[j]))
            # CGS2: two passes of classical Gram-Schmidt
            h1 = V @ w                       # (m+1,) includes zeros rows
            w = w - V.T @ h1
            h2 = V @ w
            w = w - V.T @ h2
            h = h1 + h2
            wnorm = jnp.linalg.norm(w)
            H = H.at[:, j].set(h)
            H = H.at[j + 1, j].set(wnorm)
            V = V.at[j + 1].set(w / jnp.where(wnorm == 0, 1.0, wnorm))
            return (V, H), None

        (V, H), _ = jax.lax.scan(arnoldi, (V, H), jnp.arange(m))
        # least squares: min || beta e1 - H y ||
        e1 = jnp.zeros(m + 1, dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        x = x + V[:m].T @ y
        return x

    def cond(state):
        x, k = state
        r = M(b - A(x))
        return (jnp.linalg.norm(r) > target) & (k < max_restarts)

    def body(state):
        x, k = state
        return cycle(x), k + 1

    x, k = jax.lax.while_loop(cond, body, (x0, jnp.array(0)))
    r = M(b - A(x))
    return x, SolveInfo(k * m, jnp.linalg.norm(r))


def fgmres(A: Callable, b: jnp.ndarray, x0=None, M: Optional[Callable] = None,
           tol: float = 1e-10, atol: float = 0.0, restart: int = 30,
           max_restarts: int = 20):
    """Flexible GMRES (right preconditioning, Saad 1993): tolerates
    nonlinear/varying preconditioners (inner Krylov solves, Schur field-split
    with inner CG) by storing the preconditioned basis Z."""
    n = b.shape[0]
    dtype = b.dtype
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = M or (lambda r: r)
    m = restart
    bnorm = jnp.linalg.norm(b)
    target = jnp.maximum(tol * bnorm, atol)

    def cycle(x):
        r = b - A(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dtype).at[0].set(r / jnp.where(beta == 0, 1.0, beta))
        Z = jnp.zeros((m, n), dtype)
        H = jnp.zeros((m + 1, m), dtype)

        def arnoldi(carry, j):
            V, Z, H = carry
            z = M(V[j])
            w = A(z)
            h1 = V @ w
            w = w - V.T @ h1
            h2 = V @ w
            w = w - V.T @ h2
            h = h1 + h2
            wnorm = jnp.linalg.norm(w)
            H = H.at[:, j].set(h)
            H = H.at[j + 1, j].set(wnorm)
            V = V.at[j + 1].set(w / jnp.where(wnorm == 0, 1.0, wnorm))
            Z = Z.at[j].set(z)
            return (V, Z, H), None

        (V, Z, H), _ = jax.lax.scan(arnoldi, (V, Z, H), jnp.arange(m))
        e1 = jnp.zeros(m + 1, dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        return x + Z.T @ y

    def cond(state):
        x, k = state
        r = b - A(x)
        return (jnp.linalg.norm(r) > target) & (k < max_restarts)

    def body(state):
        x, k = state
        return cycle(x), k + 1

    x, k = jax.lax.while_loop(cond, body, (x0, jnp.array(0)))
    r = b - A(x)
    return x, SolveInfo(k * m, jnp.linalg.norm(r))


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
