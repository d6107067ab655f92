"""Smoothers for multigrid: weighted Jacobi and Chebyshev.

The reference smooths with Richardson+ILU or ASM blocks via PETSc
(LinearEquationSolverPetsc.cpp:219-290).  ILU does not vectorize on TPU;
Chebyshev/weighted-Jacobi are the standard hardware-friendly replacements
(SURVEY.md §7 hard part 3), plus batched dense block (Vanka/ASM-style)
smoothers in asm_smoother.py.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def power_lambda_max(A: Callable, dinv: jnp.ndarray, n: int, iters: int = 25,
                     key=None) -> jnp.ndarray:
    """Estimate lambda_max(D^-1 A) by power iteration (jit-safe)."""
    v = jnp.sin(jnp.arange(n, dtype=dinv.dtype) + 1.0)   # deterministic seed
    v = v / jnp.linalg.norm(v)

    def body(v, _):
        w = dinv * A(v)
        nw = jnp.linalg.norm(w)
        return w / nw, nw

    v, nw = jax.lax.scan(body, v, None, length=iters)
    return nw[-1]


def jacobi_smoother(A: Callable, diag: jnp.ndarray, omega: float = 0.8,
                    iters: int = 2):
    """x <- x + omega D^-1 (b - A x), ``iters`` times."""
    dinv = 1.0 / diag

    def smooth(b, x):
        def body(x, _):
            return x + omega * dinv * (b - A(x)), None
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x

    return smooth


def chebyshev_smoother(A: Callable, diag: jnp.ndarray, lam_max: jnp.ndarray,
                       degree: int = 3, eig_ratio: float = 10.0):
    """Chebyshev polynomial smoother on D^-1 A with eigenvalue window
    [lam_max/eig_ratio, 1.1 lam_max] (hypre/AMG standard practice)."""
    dinv = 1.0 / diag
    lmax = 1.1 * lam_max
    lmin = lmax / eig_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)

    def smooth(b, x):
        r = b - A(x)
        # standard Chebyshev iteration (Saad alg. 12.1 adapted to precond.)
        sigma = theta / delta
        rho = 1.0 / sigma
        d = dinv * r / theta
        x = x + d
        def body(carry, _):
            x, d, rho = carry
            r = b - A(x)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * (dinv * r)
            x = x + d
            return (x, d, rho_new), None
        (x, _, _), _ = jax.lax.scan(body, (x, d, rho), None, length=degree - 1)
        return x

    return smooth
