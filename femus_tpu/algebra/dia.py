"""Diagonal (DIA) sparse operator — the gather-free TPU SpMV path.

XLA/TPU executes irregular per-row gathers (classic CSR/ELL SpMV) orders of
magnitude below the HBM roofline.  FEM operators on lattice-ordered dof
numberings are *stencil* matrices: every nonzero lies on one of a small set
of constant diagonals (col - row = const; e.g. 25 diagonals for Q2 quads).
Storing the matrix by diagonals turns SpMV into

    y = sum_k  data[k, :] * x[off_k : off_k + n]

— static shifted slices and multiply-adds only: pure VPU work with
sequential HBM streams, no indices read at all (4 B/nnz instead of 8).
A Pallas kernel (spmv_dia_pallas) tiles rows and keeps the x window in VMEM.

Conversion from the general ELL operator is a precomputed gather (host-built
slot map), so assembled data can be re-laid out on device each Newton step.
Falls back to None when the pattern has too many distinct diagonals
(unstructured meshes keep the ELL path).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import EllPattern, SparseOp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DiaOp:
    """data[k, i] = A[i, i + offsets[k]] (0 where out of band/pattern)."""

    data: jnp.ndarray            # (K, n)
    offsets: Tuple[int, ...]     # static
    n: int

    def tree_flatten(self):
        return (self.data,), (self.offsets, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @property
    def n_rows(self):
        return self.n

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        lo = -min(0, min(self.offsets))
        hi = max(0, max(self.offsets))
        xpad = jnp.pad(x, (lo, hi))
        y = jnp.zeros_like(x)
        for k, off in enumerate(self.offsets):
            y = y + self.data[k] * jax.lax.dynamic_slice(
                xpad, (lo + off,), (self.n,))
        return y

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jnp.ndarray:
        k = self.offsets.index(0)
        return self.data[k]


@dataclasses.dataclass
class DiaPlan:
    """Host-built ELL -> DIA relayout plan."""

    offsets: Tuple[int, ...]
    src: np.ndarray          # (K, n) int64 flat index into ell data (or -1)

    def apply(self, ell_data: jnp.ndarray, n: int) -> DiaOp:
        flat = jnp.concatenate([ell_data.ravel(),
                                jnp.zeros(1, ell_data.dtype)])   # -1 -> 0
        data = flat[jnp.asarray(self.src)]
        return DiaOp(data, self.offsets, n)


def build_dia_plan(pattern: EllPattern, max_diags: int = 128) -> Optional[DiaPlan]:
    """Detect diagonal structure; returns None if > max_diags distinct offsets."""
    if pattern.n_rows != pattern.n_cols:
        return None
    counts = np.diff(pattern.indptr)
    rows = np.repeat(np.arange(pattern.n_rows, dtype=np.int64), counts)
    offs = pattern.indices - rows
    uniq = np.unique(offs)
    if len(uniq) > max_diags:
        return None
    koff = np.searchsorted(uniq, offs)
    src = np.full((len(uniq), pattern.n_rows), -1, np.int64)
    src[koff, rows] = pattern.csr_to_ell_slots()
    # -1 maps to the appended zero element
    src = np.where(src < 0, pattern.n_rows * pattern.width, src)
    return DiaPlan(tuple(int(o) for o in uniq), src)


# ---------------------------------------------------------------------------
# Pallas DIA SpMV kernel: rows tiled; x window resident in VMEM per tile.
# ---------------------------------------------------------------------------

def spmv_dia_pallas(op: DiaOp, x: jnp.ndarray, tile: int = 32768) -> jnp.ndarray:
    """y = A x with the DIA operator via a Pallas row-tiled kernel.

    The diagonal data slab (K, tile) streams through VMEM via the block
    pipeline; the overlapping x window [i*tile, i*tile + tile + span) is
    DMA'd explicitly (overlap prevents plain BlockSpec indexing).  The K
    shifted multiply-adds run on the VPU out of VMEM; HBM traffic =
    4 B/nnz data + ~1x x stream.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = op.n
    K = op.data.shape[0]
    lo = -min(0, min(op.offsets))
    hi = max(0, max(op.offsets))
    span = lo + hi
    n_pad = -(-n // tile) * tile
    data = op.data
    if n_pad != n:
        data = jnp.pad(data, ((0, 0), (0, n_pad - n)))
    # DMA slice length must be lane-aligned (128)
    win = -(-(tile + span) // 128) * 128
    # pad x so every tile's [i*tile, i*tile + win) window is in bounds
    xpad = jnp.pad(x, (lo, (n_pad - n) + (win - tile - span) + hi))
    offs = [int(o) + lo for o in op.offsets]           # window-relative

    def kernel(d_ref, x_hbm, y_ref):
        i = pl.program_id(0)

        def body(xwin, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(i * tile, win)], xwin, sem)
            cp.start()
            cp.wait()
            acc = d_ref[0, :] * xwin[0, offs[0]:offs[0] + tile]
            for k in range(1, K):
                acc = acc + d_ref[k, :] * xwin[0, offs[k]:offs[k] + tile]
            y_ref[0, :] = acc

        pl.run_scoped(body,
                      xwin=pltpu.VMEM((1, win), x.dtype),
                      sem=pltpu.SemaphoreType.DMA)

    grid = (n_pad // tile,)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(data, xpad[None, :])
    return y[0, :n]
