"""Assembly over mixed element-type meshes: one batched kernel per geometry
block, all feeding ONE union ELL pattern over one global dof numbering
(SURVEY.md §7 hard part 4; reference per-element types, Elem.hpp:45).

Each block gets a standard :class:`Assembler` whose dofmaps were replaced by
the global mixed numbering (mesh/mixed.py), so its residual vector and ELL
pattern already live in the global dof space; the union operator is a
precomputed slot remap (block ELL slot -> union ELL slot) applied as one
scatter-add per block.  Dirichlet elimination runs ONCE at the union level
(block-level elimination would double-insert identity diagonals on shared
rows).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra.sparse import SparseOp, pad_pattern, pattern_from_pairs
from ..mesh.mixed import MixedMesh, build_global_dofmaps
from .engine import Assembler, Unknown, _build_slot_lut


class MixedAssembler:
    def __init__(self, mmesh: MixedMesh, unknowns: Sequence[Unknown],
                 quad_order: str = "fifth", dtype=jnp.float64):
        self.mesh = mmesh
        self.unknowns = list(unknowns)
        self.dtype = dtype
        for u in unknowns:
            build_global_dofmaps(mmesh, u.family)
        self.subs: List[Assembler] = [
            Assembler(b, unknowns, quad_order=quad_order, dtype=dtype)
            for b in mmesh.blocks]
        s0 = self.subs[0]
        self.offsets: Dict[str, int] = s0.offsets
        self.dofmaps = s0.dofmaps
        self.n_dofs = s0.n_dofs
        assert all(s.n_dofs == self.n_dofs for s in self.subs)
        assert all(s.n_dofs_pad == s0.n_dofs_pad for s in self.subs)
        self.n_dofs_pad = s0.n_dofs_pad

        # union ELL pattern over all blocks' couplings
        rows_all, cols_all = [], []
        for s in self.subs:
            pat = s.pattern
            v = pat.valid.ravel()
            rows_all.append(np.repeat(np.arange(pat.n_rows), pat.width)[v])
            cols_all.append(pat.cols.ravel()[v])
        upat = pattern_from_pairs(np.concatenate(rows_all),
                                  np.concatenate(cols_all),
                                  self.n_dofs, self.n_dofs)
        if self.n_dofs_pad != self.n_dofs:
            upat = pad_pattern(upat, self.n_dofs_pad, self.n_dofs_pad)
        self.pattern = upat
        lut = _build_slot_lut(upat)
        oob = upat.n_rows * upat.width
        self.remaps = []
        for s in self.subs:
            pat = s.pattern
            rr = np.repeat(np.arange(pat.n_rows, dtype=np.int64), pat.width)
            slot = lut(rr, pat.cols.ravel().astype(np.int64))
            slot = np.where(pat.valid.ravel(), slot, oob)
            self.remaps.append(jnp.asarray(slot.astype(
                np.int32 if oob < 2 ** 31 else np.int64)))
            # block-level elimination off: union applies it once
            s.dirichlet_mask = np.zeros(s.n_dofs_pad, bool)
            s.dirichlet_values = np.zeros(s.n_dofs_pad)
            s._tables_cache = None
        self.dirichlet_mask = np.zeros(self.n_dofs_pad, bool)
        self.dirichlet_mask[self.n_dofs:] = True
        self.dirichlet_values = np.zeros(self.n_dofs_pad)

    # ---- forms --------------------------------------------------------
    def set_volume_form(self, fn: Callable) -> None:
        for s in self.subs:
            s.set_volume_form(fn)

    def add_aux_field(self, name: str, family: str) -> None:
        for s in self.subs:
            s.add_aux_field(name, family)

    @property
    def aux_field_specs(self):
        return self.subs[0].aux_field_specs

    def set_dirichlet(self, mask: np.ndarray,
                      values: Optional[np.ndarray] = None) -> None:
        m = np.zeros(self.n_dofs_pad, bool)
        m[:self.n_dofs] = mask[:self.n_dofs]
        m[self.n_dofs:] = True
        self.dirichlet_mask = m
        v = np.zeros(self.n_dofs_pad)
        if values is not None:
            v[:self.n_dofs] = values[:self.n_dofs]
        self.dirichlet_values = v

    # ---- assembly -------------------------------------------------------
    def make_assemble_fn(self, with_jacobian: bool = True):
        sub_fns = [s.make_assemble_fn(with_jacobian=with_jacobian)
                   for s in self.subs]
        nr, w = self.pattern.n_rows, self.pattern.width
        cols_j = jnp.asarray(self.pattern.cols)
        valid_j = jnp.asarray(self.pattern.valid)
        rows_j = jnp.arange(nr)[:, None]

        def assemble(u, aux_fields=None, aux_scalars=None):
            R = jnp.zeros(self.n_dofs_pad, self.dtype)
            df = jnp.zeros(nr * w, self.dtype)
            for fn, remap in zip(sub_fns, self.remaps):
                Rs, Ds = fn(u, aux_fields, aux_scalars)
                R = R + Rs
                if with_jacobian:
                    df = df.at[remap].add(Ds.ravel(), mode="drop")
            dm = jnp.asarray(self.dirichlet_mask)
            R = jnp.where(dm, 0.0, R)
            data = None
            if with_jacobian:
                data = df.reshape(nr, w)
                bad = dm[rows_j] | dm[cols_j]
                ident = (cols_j == rows_j) & dm[rows_j] & valid_j
                data = jnp.where(bad, jnp.where(ident, 1.0, 0.0), data)
            return R, data

        return assemble

    def op_with(self, data: jnp.ndarray) -> SparseOp:
        return SparseOp(data, jnp.asarray(self.pattern.cols),
                        self.pattern.n_cols)


def generate_bdc_mixed(masm: MixedAssembler, bc_fn: Callable,
                       time: float = 0.0) -> None:
    """GenerateBdc over a mixed mesh: per-block face sweeps OR-ed into one
    global Dirichlet mask/value set (block faces carry global dof ids)."""
    from .bc import generate_bdc
    mask = np.zeros(masm.n_dofs_pad, bool)
    vals = np.zeros(masm.n_dofs_pad)
    for s in masm.subs:
        generate_bdc(s, bc_fn, time=time)
        sel = s.dirichlet_mask[:s.n_dofs]
        mask[:s.n_dofs] |= sel
        vals[:s.n_dofs][sel] = s.dirichlet_values[:s.n_dofs][sel]
        # restore block-level no-elimination invariant
        s.dirichlet_mask = np.zeros(s.n_dofs_pad, bool)
        s.dirichlet_values = np.zeros(s.n_dofs_pad)
        s._tables_cache = None
    masm.set_dirichlet(mask, vals)
