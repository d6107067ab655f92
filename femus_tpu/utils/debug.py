"""Debug aids: matrix dumps, per-iteration field dumps, element-Jacobian
printer.

Reference equivalents:
- ``SparseMatrix::print_matlab / PrintMatlab`` (SparseMatrix.hpp /
  PetscMatrix.cpp matrix viewers) -> :func:`save_matrix_market` /
  :func:`op_to_scipy` (inspect in scipy, spy-plot, condition-number checks).
- ``assemble_jacobian::print_element_jacobian / print_element_residual``
  (Assemble_jacobian.hpp:78-107) -> :func:`element_jacobian` /
  :func:`print_element_jacobian` — extract one element's local residual and
  exact jacfwd Jacobian from the batched engine for eyeball comparison.
- the reference's per-nonlinear-iteration solution printing
  (``mlSol.GetWriter()->Write(...)`` inside assembly debug branches) ->
  :class:`FieldDumper`, a System hook writing numbered VTK snapshots.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# matrix dumps
# ---------------------------------------------------------------------------

def op_to_scipy(pattern, data, n: Optional[int] = None):
    """ELL (pattern, data) -> scipy CSR, trimmed to the first n rows/cols
    (drop padding).  Works on any assembler's pattern + assembled data."""
    import scipy.sparse as sp
    w = pattern.width
    rows = np.repeat(np.arange(pattern.n_rows), w)
    cols = np.asarray(pattern.cols).ravel()
    vals = np.asarray(data).ravel()
    valid = np.asarray(pattern.valid).ravel()
    m = sp.csr_matrix((vals[valid], (rows[valid], cols[valid])),
                      shape=(pattern.n_rows, pattern.n_rows))
    if n is not None:
        m = m[:n, :n]
    return m


def save_matrix_market(path: str, pattern, data,
                       n: Optional[int] = None) -> str:
    """Dump an assembled operator to MatrixMarket .mtx (the portable
    analogue of the reference's PETSc matrix viewers)."""
    import scipy.io as sio
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    sio.mmwrite(path, op_to_scipy(pattern, data, n))
    return path if path.endswith(".mtx") else path + ".mtx"


# ---------------------------------------------------------------------------
# element Jacobian / residual printer
# ---------------------------------------------------------------------------

def element_jacobian(assembler, u, elem: int, aux_fields=None,
                     aux_scalars=None):
    """(local residual, local Jacobian, global dof ids) of one element.

    The exact jacfwd element Jacobian the batched engine integrates —
    the analogue of the reference's adept-tape per-element printout
    (Assemble_jacobian.hpp:78-107) — via the engine's own
    ``_elem_residual`` on that element's gathered dofs."""
    import jax
    import jax.numpy as jnp

    t = assembler.device_tables_cached()
    edofs = np.asarray(assembler.edofs)[elem]            # (ndt,)
    coords = t["coords_e"][elem]
    aux_fields = aux_fields or {}
    aux_loc = {name: jnp.asarray(aux_fields[name])[t["aux_conn"][name][elem]]
               for name, _ in assembler.aux_field_specs}
    aux_loc["group"] = t["groups"][elem] if "groups" in t else \
        jnp.asarray(getattr(assembler.mesh, "elem_group")[elem])

    def local_residual(ul):
        return assembler._elem_residual(t["tabs"], t["qweights"], ul, coords,
                                        aux_loc, aux_scalars or {})

    ul = jnp.asarray(u)[edofs].astype(assembler.dtype)
    r = local_residual(ul)
    J = jax.jacfwd(local_residual)(ul)
    return np.asarray(r), np.asarray(J), edofs


def print_element_jacobian(assembler, u, elem: int, aux_fields=None,
                           aux_scalars=None, precision: int = 3) -> str:
    r, J, edofs = element_jacobian(assembler, u, elem, aux_fields, aux_scalars)
    with np.printoptions(precision=precision, suppress=True, linewidth=200):
        txt = (f"element {elem}: dofs {edofs.tolist()}\n"
               f"residual:\n{r}\njacobian:\n{J}\n")
    print(txt)
    return txt


# ---------------------------------------------------------------------------
# per-iteration field dumps
# ---------------------------------------------------------------------------

class FieldDumper:
    """Writes a numbered VTK snapshot of every unknown each time ``dump`` is
    called (attach around nonlinear iterations / time steps); files land as
    ``<dir>/<name>.<k:04d>.vtu``."""

    def __init__(self, system, out_dir: str, name: str = "iter"):
        self.system = system
        self.dir = out_dir
        self.name = name
        self.k = 0
        os.makedirs(out_dir, exist_ok=True)

    def dump(self, level: int = -1) -> str:
        from ..io.vtk import nodal_field, write_vtu
        mesh = self.system.ml_mesh.levels[level]
        ml_sol = self.system.ml_sol
        pd: Dict[str, np.ndarray] = {}
        for n in self.system.unknown_names:
            fam = ml_sol.vars[n].family
            pd[n] = nodal_field(mesh, fam, ml_sol.sol[level][n])
        path = os.path.join(self.dir, f"{self.name}.{self.k:04d}.vtu")
        self.k += 1
        return write_vtu(path, mesh, pd)
