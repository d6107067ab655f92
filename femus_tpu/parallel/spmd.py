"""SPMD distribution over a jax.sharding device mesh.

The reference's single parallel strategy is MPI domain decomposition
(SURVEY.md §2.4): METIS element partition, contiguous per-rank element/dof
ranges, ghost exchange inside PETSc SpMV.  The TPU-native equivalent here:

- elements and dof rows are sharded over a 1-D ``Mesh(("mesh",))`` axis
  (row partition of the stacked KKoffset block vector);
- the global solve step is written once and annotated with
  ``with_sharding_constraint``; the XLA SPMD partitioner inserts the
  collectives (all-gathers for the irregular dof gathers, reduce-scatters
  for the scatter-adds) over ICI — the static-pattern analogue of PETSc's
  ghost updates;
- shapes are made divisible by the axis size via the assembler's padding
  rows/elements (identity rows, dropped scatters).

An explicit shard_map + halo-plan SpMV (ppermute-based, overlapping interior
compute) lives in halo.py for the performance path.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..algebra.krylov import cg, gmres
from ..algebra.mg import build_hierarchy
from ..algebra.transfer import build_ptap_schedule, op_pair_from_scipy
from ..assembly.engine import Assembler


def device_mesh(n_devices: Optional[int] = None, axis: str = "mesh") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_rows(mesh: Mesh, axis: str = "mesh"):
    return NamedSharding(mesh, P(axis))


class _HaloOp:
    """SparseOp facade whose matvec is the explicit halo-exchange SpMV
    (ppermute/all_to_all plan) instead of the XLA-partitioned gather —
    routes every Krylov/smoother matvec in the sharded step through the
    static communication schedule (SURVEY.md §2.4 ghost-exchange row)."""

    def __init__(self, A, mv: Callable):
        self._A = A
        self.mv = mv
        self.data = A.data
        self.cols = A.cols
        self.n_cols = A.n_cols

    @property
    def n_rows(self):
        return self._A.n_rows

    @property
    def width(self):
        return self._A.width

    def matvec(self, x):
        return self.mv(x)

    def __matmul__(self, x):
        return self.mv(x)

    def diagonal(self):
        return self._A.diagonal()

    def to_dense(self):
        return self._A.to_dense()


def make_sharded_step(assembler: Assembler, mesh: Mesh,
                      transfers: Sequence = (),
                      dir_masks: Sequence = (),
                      outer: str = "gmres", rtol: float = 1e-8,
                      restart: int = 30, max_outer: int = 10,
                      smoother: str = "jacobi",
                      aux_scalars: Optional[dict] = None,
                      use_halo: bool = True,
                      local_format: str = "auto",
                      mg_cycle: str = "V",
                      vanka_blocks: Optional[Sequence] = None,
                      vanka_omega: float = 0.9,
                      with_aux: bool = False) -> Callable:
    """One jitted Newton/linear step with row/element sharding constraints.

    Returns step(u) -> (u_new, residual_norm); ``u`` is the padded stacked
    dof vector, sharded over the mesh axis.

    use_halo=True routes the FINE operator's SpMV (Krylov + fine smoother)
    through the explicit halo plan (halo.py): one padded all_to_all ships
    exactly the ghost dofs, instead of the XLA partitioner's all-gather of
    the full vector per gather.  Falls back automatically when the padded
    row count does not divide the mesh axis.

    local_format: layout of each shard's local operator block inside the
    halo SpMV — "ell" (gather form; best on CPU test meshes), "bell"
    (per-shard blocked-ELL slab, halo.make_halo_spmv_bell — the TPU fast
    path; slab re-laid once per assembly), or "auto" (bell on accelerator
    backends, ell on CPU).
    """
    assemble = assembler.make_assemble_fn()
    vec_sh = NamedSharding(mesh, P("mesh"))
    row_sh = NamedSharding(mesh, P("mesh", None))
    scalars = dict(aux_scalars or {})
    axis = mesh.axis_names[0]
    n_shards = mesh.shape[axis]
    if local_format == "auto":
        local_format = "ell" if jax.default_backend() == "cpu" else "bell"

    halo_spmv = halo_bell = None
    if use_halo and assembler.pattern.n_rows % n_shards == 0 and n_shards > 1:
        from .halo import build_halo_plan, make_halo_spmv, make_halo_spmv_bell
        plan = build_halo_plan(assembler.pattern, n_shards)
        if local_format == "bell":
            halo_bell = make_halo_spmv_bell(plan, assembler.pattern, mesh,
                                            axis)
        else:
            halo_spmv, _ = make_halo_spmv(plan, mesh, axis)

    def step(u, aux_fields=None):
        u = jax.lax.with_sharding_constraint(u, vec_sh)
        R, data = assemble(u, aux_fields if with_aux else {}, scalars)
        R = jax.lax.with_sharding_constraint(R, vec_sh)
        data = jax.lax.with_sharding_constraint(data, row_sh)
        A = assembler.op_with(data)
        if halo_bell is not None:
            prepare, bell_mv = halo_bell
            slab = prepare(data)
            A = _HaloOp(A, lambda x: bell_mv(slab, x))
        elif halo_spmv is not None:
            A = _HaloOp(A, lambda x: halo_spmv(data, x))
        if transfers:
            h = build_hierarchy(A, list(transfers), smoother=smoother,
                                dir_masks=list(dir_masks),
                                vanka_blocks=vanka_blocks,
                                vanka_omega=vanka_omega)
            M = h.as_preconditioner(mg_cycle)
        else:
            d = A.diagonal()
            dsafe = jnp.where(jnp.abs(d) < 1e-30, 1.0, d)
            M = lambda r: r / dsafe
        if outer == "cg":
            delta, info = cg(A.matvec, -R, M=M, tol=rtol,
                             maxiter=max_outer * restart)
        elif outer == "fgmres" or mg_cycle == "K":
            # the K-cycle runs Krylov iterations INSIDE the preconditioner
            # (a nonlinear operator): the outer solve must be flexible
            # GMRES, exactly as System.step_fn auto-selects it
            from ..algebra.krylov import fgmres
            delta, info = fgmres(A.matvec, -R, M=M, tol=rtol,
                                 restart=restart, max_restarts=max_outer)
        else:
            delta, info = gmres(A.matvec, -R, M=M, tol=rtol,
                                restart=restart, max_restarts=max_outer)
        u_new = jax.lax.with_sharding_constraint(u + delta, vec_sh)
        return u_new, info.residual

    if with_aux:
        # aux fields (e.g. the theta-scheme old solution) ride replicated
        rep = NamedSharding(mesh, P())
        return jax.jit(step,
                       in_shardings=(shard_rows(mesh), rep),
                       out_shardings=(shard_rows(mesh), None))
    return jax.jit(lambda u: step(u),
                   in_shardings=shard_rows(mesh),
                   out_shardings=(shard_rows(mesh), None))


def pad_prolongation(P_csr, nf_pad: int, nc_pad: int):
    """Resize a prolongation matrix with zero padding rows/cols."""
    import scipy.sparse as sp
    Pm = sp.csr_matrix(P_csr)
    Pm.resize((nf_pad, nc_pad))
    return Pm.tocsr()
