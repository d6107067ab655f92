"""Hierarchical sparse-grid density estimation.

Reference: ``sparseGrid`` (sparseGrid.hpp:13-44 — hierarchical sparse-grid
PDF estimator over samples with EvaluatePDF and ComputeAvgL2Error).  Here: a
standard Smolyak construction of hierarchical hat functions on a box; PDF
coefficients solve the (small, dense) Galerkin system M c = b with
b_i = mean_s phi_i(x_s) — the L2-projection density estimate.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import List, Sequence, Tuple

import numpy as np


def _hat(level: int, idx: int, t: np.ndarray) -> np.ndarray:
    """Hierarchical hat on [0,1]: level l has odd idx in [1, 2^l - 1],
    support width 2^{1-l}, centered at idx/2^l."""
    h = 0.5 ** level
    c = idx * h
    return np.maximum(0.0, 1.0 - np.abs(t - c) / h)


@dataclasses.dataclass
class SparseGridPDF:
    bounds: np.ndarray                 # (dim, 2)
    levels: List[Tuple[Tuple[int, ...], Tuple[int, ...]]]  # (lvl vec, idx vec)
    coeff: np.ndarray

    def evaluate(self, x: np.ndarray) -> np.ndarray:
        t = (np.asarray(x) - self.bounds[:, 0]) / (
            self.bounds[:, 1] - self.bounds[:, 0])
        vals = np.zeros(len(t))
        for (lv, ix), c in zip(self.levels, self.coeff):
            phi = np.ones(len(t))
            for d in range(t.shape[1]):
                phi *= _hat(lv[d], ix[d], t[:, d])
            vals += c * phi
        # scale back to physical density
        vol = np.prod(self.bounds[:, 1] - self.bounds[:, 0])
        return vals / vol


def _index_set(dim: int, max_level: int):
    out = []
    for lv in itertools.product(range(1, max_level + 1), repeat=dim):
        if sum(lv) <= max_level + dim - 1:
            for ix in itertools.product(*[range(1, 2 ** l, 2) for l in lv]):
                out.append((lv, ix))
    return out


def fit_pdf(samples: np.ndarray, max_level: int = 4,
            bounds=None) -> SparseGridPDF:
    """L2-projection sparse-grid density estimate from samples."""
    samples = np.atleast_2d(np.asarray(samples, float))
    if samples.shape[0] == 1 and samples.shape[1] > 1 and samples.ndim == 2:
        pass
    dim = samples.shape[1]
    if bounds is None:
        lo, hi = samples.min(axis=0), samples.max(axis=0)
        pad = 0.05 * (hi - lo)
        bounds = np.stack([lo - pad, hi + pad], axis=1)
    bounds = np.asarray(bounds, float)
    t = (samples - bounds[:, 0]) / (bounds[:, 1] - bounds[:, 0])
    levels = _index_set(dim, max_level)
    nb = len(levels)
    # basis values at samples
    Phi = np.ones((nb, len(t)))
    for k, (lv, ix) in enumerate(levels):
        for d in range(dim):
            Phi[k] *= _hat(lv[d], ix[d], t[:, d])
    b = Phi.mean(axis=1)
    # Galerkin mass matrix on the unit box via tensor-product exact 1-D overlaps
    M = np.ones((nb, nb))
    for d in range(dim):
        g1 = np.array([[_overlap(levels[i][0][d], levels[i][1][d],
                                 levels[j][0][d], levels[j][1][d])
                        for j in range(nb)] for i in range(nb)])
        M *= g1
    c = np.linalg.solve(M + 1e-12 * np.eye(nb), b)
    return SparseGridPDF(bounds, levels, c)


def _overlap(l1, i1, l2, i2) -> float:
    """Exact integral of two 1-D hats on [0,1] (numerical, cached scale)."""
    h1, h2 = 0.5 ** l1, 0.5 ** l2
    a = max((i1 - 1) * h1, (i2 - 1) * h2)
    b = min((i1 + 1) * h1, (i2 + 1) * h2)
    if b <= a:
        return 0.0
    # 3-point Gauss on each of the <=4 linear pieces: exact for piecewise linear
    knots = sorted({a, b, i1 * h1, i2 * h2} | {v for v in ((i1 - 1) * h1,
                   (i1 + 1) * h1, (i2 - 1) * h2, (i2 + 1) * h2) if a < v < b})
    total = 0.0
    for lo, hi in zip(knots[:-1], knots[1:]):
        if hi <= a or lo >= b:
            continue
        xs = np.array([lo + (hi - lo) * g for g in (0.1127016653792583,
                                                    0.5, 0.8872983346207417)])
        ws = np.array([5 / 18, 8 / 18, 5 / 18]) * (hi - lo)
        total += float((ws * _hat(l1, i1, xs) * _hat(l2, i2, xs)).sum())
    return total


def avg_l2_error(pdf: SparseGridPDF, true_pdf, n_mc: int = 20000,
                 rng=None) -> float:
    """Monte-Carlo L2 error of the estimated density vs the true density on
    the sparse grid's box (reference ComputeAvgL2Error)."""
    rng = rng or np.random.default_rng(0)
    dim = pdf.bounds.shape[0]
    x = rng.uniform(pdf.bounds[:, 0], pdf.bounds[:, 1], size=(n_mc, dim))
    diff = pdf.evaluate(x) - true_pdf(x)
    vol = np.prod(pdf.bounds[:, 1] - pdf.bounds[:, 0])
    return float(np.sqrt(vol * np.mean(diff ** 2)))
