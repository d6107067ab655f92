"""Condition-number estimation (2-norm) of assembled operators.

Equivalent of the reference's ``SlepcSVD`` (SlepcSVD.hpp:41,
unittests/testSVD2NormCondNumb): sigma_max / sigma_min of the operator.
TPU-native: Lanczos on A^T A for sigma_max; inverse power iteration with CG
solves for sigma_min — all matrix-free, jit-compatible.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .krylov import cg


def _ata(A: Callable, At: Callable) -> Callable:
    return lambda x: At(A(x))


def sigma_max(A: Callable, At: Callable, n: int, iters: int = 40,
              dtype=jnp.float64) -> jnp.ndarray:
    """Largest singular value via Lanczos on A^T A."""
    B = _ata(A, At)
    v = jnp.sin(jnp.arange(n, dtype=dtype) + 1.0)
    v = v / jnp.linalg.norm(v)
    alphas = []
    betas = []
    v_prev = jnp.zeros_like(v)
    beta = 0.0
    for _ in range(iters):
        w = B(v) - beta * v_prev
        alpha = v @ w
        w = w - alpha * v
        beta = jnp.linalg.norm(w)
        alphas.append(alpha)
        betas.append(beta)
        v_prev = v
        v = w / jnp.where(beta == 0, 1.0, beta)
    T = (jnp.diag(jnp.stack(alphas))
         + jnp.diag(jnp.stack(betas[:-1]), 1)
         + jnp.diag(jnp.stack(betas[:-1]), -1))
    lam = jnp.linalg.eigvalsh(T)
    return jnp.sqrt(jnp.maximum(lam[-1], 0.0))


def sigma_min(A: Callable, At: Callable, n: int, outer: int = 15,
              inner_tol: float = 1e-10, inner_iters: int = 2000,
              dtype=jnp.float64) -> jnp.ndarray:
    """Smallest singular value via inverse power iteration on A^T A
    (each step: solve A^T A z = v with CG)."""
    B = _ata(A, At)
    v = jnp.cos(jnp.arange(n, dtype=dtype) * 0.7 + 0.3)
    v = v / jnp.linalg.norm(v)
    mu = jnp.asarray(1.0, dtype)
    for _ in range(outer):
        z, _ = cg(B, v, tol=inner_tol, maxiter=inner_iters)
        zn = jnp.linalg.norm(z)
        mu = zn
        v = z / zn
    lam_min = (v @ B(v))
    return jnp.sqrt(jnp.maximum(lam_min, 0.0))


def cond_2norm(op, iters: int = 40) -> Tuple[float, float, float]:
    """(cond, sigma_max, sigma_min) for a SparseOp/DiaOp-like operator with
    .matvec and .rmatvec (symmetric ops may pass matvec twice)."""
    A = op.matvec
    At = getattr(op, "rmatvec", op.matvec)
    n = op.n_rows
    smax = sigma_max(A, At, n, iters)
    smin = sigma_min(A, At, n)
    return float(smax / smin), float(smax), float(smin)
