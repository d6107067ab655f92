"""Uncertainty quantification: polynomial chaos expansion tables.

Reference: ``uq`` (uq.hpp:16 — Hermite/Legendre quadrature points :174+,
tensor-product and total-degree multi-index sets ComputeTensorProductSet :42 /
ComputeIndexSet :81, stochastic integral & mass matrices :96-123, multivariate
polynomial evaluations :128-145; global instances FemusInit.cpp:37-38).

Host-side numpy tables feeding batched device evaluation of stochastic
samples; orthonormal probabilists' Hermite (standard Gaussian weight) and
Legendre on [-1, 1] (uniform weight).
"""
from __future__ import annotations

import functools
import itertools
import math
from typing import Tuple

import numpy as np
from numpy.polynomial.hermite_e import hermegauss
from numpy.polynomial.legendre import leggauss


@functools.lru_cache(maxsize=None)
def quadrature_1d(kind: str, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Gauss points/weights wrt the probability measure: 'hermite' = N(0,1),
    'legendre' = U(-1,1)."""
    if kind == "hermite":
        x, w = hermegauss(n)
        return x, w / w.sum()
    if kind == "legendre":
        x, w = leggauss(n)
        return x, w / 2.0
    raise KeyError(kind)


def polys_1d(kind: str, deg: int, x: np.ndarray) -> np.ndarray:
    """Orthonormal polynomial values: (deg+1, len(x))."""
    x = np.asarray(x, float)
    out = np.zeros((deg + 1, len(x)))
    if kind == "hermite":
        # probabilists' Hermite He_n, orthonormal: He_n / sqrt(n!)
        prev, cur = np.zeros_like(x), np.ones_like(x)
        for n in range(deg + 1):
            out[n] = cur / np.sqrt(float(math.factorial(n)) if n < 171 else np.inf)
            prev, cur = cur, x * cur - n * prev
        return out
    if kind == "legendre":
        prev, cur = np.zeros_like(x), np.ones_like(x)
        for n in range(deg + 1):
            out[n] = cur * np.sqrt(2 * n + 1)
            nxt = ((2 * n + 1) * x * cur - n * prev) / (n + 1)
            prev, cur = cur, nxt
        return out
    raise KeyError(kind)


def tensor_product_set(dims: int, n_per_dim: int) -> np.ndarray:
    """Full tensor multi-index set (reference ComputeTensorProductSet)."""
    return np.array(list(itertools.product(range(n_per_dim), repeat=dims)), int)


def total_degree_set(dims: int, max_deg: int) -> np.ndarray:
    """Total-degree multi-index set (reference ComputeIndexSet)."""
    return np.array([m for m in itertools.product(range(max_deg + 1), repeat=dims)
                     if sum(m) <= max_deg], int)


def multivariate_polys(kind: str, index_set: np.ndarray,
                       samples: np.ndarray) -> np.ndarray:
    """Psi_k(xi_s): (n_terms, n_samples) for samples (n_samples, dims)."""
    dims = index_set.shape[1]
    deg = int(index_set.max())
    vals = np.stack([polys_1d(kind, deg, samples[:, d]) for d in range(dims)])
    out = np.ones((index_set.shape[0], samples.shape[0]))
    for k, midx in enumerate(index_set):
        for d in range(dims):
            out[k] *= vals[d, midx[d]]
    return out


def stochastic_mass_matrix(kind: str, index_set: np.ndarray,
                           nq_1d: int) -> np.ndarray:
    """G[i,j] = E[Psi_i Psi_j] via tensor Gauss quadrature (reference
    stochastic mass matrices, uq.hpp:96-123); identity for exact quadrature
    (orthonormality check)."""
    dims = index_set.shape[1]
    x, w = quadrature_1d(kind, nq_1d)
    pts = np.array(list(itertools.product(x, repeat=dims)))
    ws = np.prod(np.array(list(itertools.product(w, repeat=dims))), axis=1)
    P = multivariate_polys(kind, index_set, pts)
    return (P * ws) @ P.T


def triple_product_tensor(kind: str, index_set: np.ndarray,
                          nq_1d: int) -> np.ndarray:
    """C[i,j,k] = E[Psi_i Psi_j Psi_k] (stochastic Galerkin coupling)."""
    dims = index_set.shape[1]
    x, w = quadrature_1d(kind, nq_1d)
    pts = np.array(list(itertools.product(x, repeat=dims)))
    ws = np.prod(np.array(list(itertools.product(w, repeat=dims))), axis=1)
    P = multivariate_polys(kind, index_set, pts)
    return np.einsum("iq,jq,kq,q->ijk", P, P, P, ws)


def pce_project(kind: str, index_set: np.ndarray, fn, nq_1d: int) -> np.ndarray:
    """Coefficients c_k = E[f Psi_k] by tensor quadrature; fn(samples)->(nq,)."""
    dims = index_set.shape[1]
    x, w = quadrature_1d(kind, nq_1d)
    pts = np.array(list(itertools.product(x, repeat=dims)))
    ws = np.prod(np.array(list(itertools.product(w, repeat=dims))), axis=1)
    P = multivariate_polys(kind, index_set, pts)
    f = np.asarray(fn(pts))
    return P @ (ws * f)
