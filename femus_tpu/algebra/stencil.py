"""2-D lattice stencil SpMV — the speed-of-light TPU path for structured dofs.

The DIA layout (dia.py) already removes index traffic, but its flattened form
needs K arbitrary-distance lane shifts per tile and runs on (1, n)-shaped
vectors — one VPU sublane out of eight.  On a lattice-ordered dof grid
(structured box meshes: Q1/Q2 dofs form an (N, M) grid and every DIA offset
decomposes as ``off = di*M + dj`` with tiny |di|, |dj|), the operator is a
variable-coefficient 2-D stencil:

    y[i, j] = sum_k  w_k[i, j] * x[i + di_k, j + dj_k]

The Pallas kernel keeps the whole padded x grid resident in VMEM (a few MB),
streams the (K, N, M) weight slab through the block pipeline (the only
O(nnz) HBM traffic: 4 B/nnz), and evaluates each weight as one full-tile
(R, Mp) multiply-add with small static sublane/lane shifts — full 8x128 VPU
utilization, no gathers, no index reads.

This is the TPU equivalent of the reference's PETSc MatMult inner loop
(SparseMatrix SpMV under KSPSolve, SURVEY.md §3.2 hot loops), specialized to
the lattice case the bench exercises; unstructured meshes fall back to
DIA/ELL.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dia import DiaOp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class StencilOp:
    """data[k, i, j] = A[(i,j), (i+di_k, j+dj_k)], zero-padded to
    (K, Nt, Mp) tiles; grid = logical (N, M)."""

    data: jnp.ndarray                      # (K, Nt, Mp)
    offsets: Tuple[Tuple[int, int], ...]   # static (di, dj)
    grid: Tuple[int, int]                  # logical (N, M)

    def tree_flatten(self):
        return (self.data,), (self.offsets, self.grid)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @property
    def n_rows(self):
        return self.grid[0] * self.grid[1]

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """jnp reference path (used for verification; XLA fuses it decently
        but the Pallas kernel below is the production path)."""
        N, M = self.grid
        hd = max(abs(di) for di, _ in self.offsets)
        hw = max(abs(dj) for _, dj in self.offsets)
        x2 = jnp.pad(x.reshape(N, M), ((hd, hd), (hw, hw)))
        y = jnp.zeros((N, M), x.dtype)
        for k, (di, dj) in enumerate(self.offsets):
            y = y + self.data[k, :N, :M] * jax.lax.dynamic_slice(
                x2, (hd + di, hw + dj), (N, M))
        return y.reshape(-1)

    def __matmul__(self, x):
        return self.matvec(x)


def build_stencil(dia: DiaOp, row_width: int, max_halo: int = 8,
                  rows_per_tile: int = 16) -> Optional[StencilOp]:
    """Decompose a DIA operator over an (N, M)-lattice dof grid.

    row_width: M, the fast (contiguous) grid dimension of the dof numbering.
    Returns None unless every offset splits as di*M + dj with
    |di|,|dj| <= max_halo (i.e. the numbering really is the lattice)."""
    n = dia.n
    if row_width <= 0 or n % row_width:
        return None
    M = row_width
    N = n // M
    offs = []
    for o in dia.offsets:
        di = int(np.rint(o / M))
        dj = o - di * M
        if abs(di) > max_halo or abs(dj) > max_halo:
            return None
        offs.append((di, dj))
    hw = max(abs(dj) for _, dj in offs)
    R = rows_per_tile
    Nt = _round_up(N, R)
    Mp = _round_up(M, 128)
    if Mp < M + 2 * hw:    # slices x2[:, hw+dj : hw+dj+Mp] must fit
        Mp = _round_up(M + 2 * hw, 128)
    K = len(offs)
    data = jnp.zeros((K, Nt, Mp), dia.data.dtype)
    data = data.at[:, :N, :M].set(dia.data.reshape(K, N, M))
    return StencilOp(data, tuple(offs), (N, M))


def spmv_stencil_pallas(op: StencilOp, x: jnp.ndarray,
                        rows_per_tile: int = 16) -> jnp.ndarray:
    """y = A x via the row-tiled stencil kernel.

    Mosaic rejects sublane offsets that are not 8-aligned, so row shifts are
    applied OUTSIDE the kernel: one XLA row-shifted view of the padded x grid
    per distinct di (a handful of cheap slices).  Every input then pipelines
    through fully aligned BlockSpecs; in-kernel work per weight k is one
    (R, Mp) multiply-add against a small static lane shift (dj) — full 8x128
    VPU tiles, no gathers.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, M = op.grid
    K, Nt, Mp = op.data.shape
    R = rows_per_tile
    assert Nt % R == 0
    offs = op.offsets
    hd = max(abs(di) for di, _ in offs)
    hw = max(abs(dj) for _, dj in offs)
    Xc = _round_up(Mp + 2 * hw, 128)

    # padded x grid: interior at [hd : hd+N, hw : hw+M]
    x2 = jnp.zeros((Nt + 2 * hd, Xc), x.dtype)
    x2 = x2.at[hd:hd + N, hw:hw + M].set(x.reshape(N, M))
    dis = sorted({di for di, _ in offs})
    di_ix = {di: i for i, di in enumerate(dis)}
    xshift = [jax.lax.slice(x2, (hd + di, 0), (hd + di + Nt, Xc))
              for di in dis]

    def kernel(d_ref, *refs):
        y_ref = refs[-1]
        xrefs = refs[:-1]
        acc = None
        for k, (di, dj) in enumerate(offs):
            xs = xrefs[di_ix[di]][:, hw + dj: hw + dj + Mp]
            term = d_ref[k] * xs
            acc = term if acc is None else acc + term
        y_ref[:] = acc

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Nt, Mp), x.dtype),
        grid=(Nt // R,),
        in_specs=[pl.BlockSpec((K, R, Mp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((R, Xc), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * len(dis),
        out_specs=pl.BlockSpec((R, Mp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * Nt * Mp,
            bytes_accessed=(K * Nt * Mp + len(dis) * Nt * Xc + Nt * Mp)
            * x.dtype.itemsize,
            transcendentals=0),
    )(op.data, *xshift)
    return y[:N, :M].reshape(-1)
