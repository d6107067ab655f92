"""Recursive FieldSplitTree (reference FieldSplitTree.hpp:42-178).

Nested {vel: {u, v}, p} Schur tree with per-split sub-preconditioners
(incl. Vanka-within-split = ASM-within-split) on the lid-driven-cavity NS
Jacobian, vs the flat one-level Schur split.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from femus_tpu.algebra.fieldsplit import (FieldSplitNode, Split,
                                          build_fieldsplit_tree,
                                          schur_fieldsplit,
                                          splits_from_offsets, jacobi_pc)
from femus_tpu.algebra.krylov import fgmres
from femus_tpu.assembly.bc import generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import navier_stokes
from femus_tpu.mesh.generation import unit_box


@pytest.fixture(scope="module")
def cavity():
    mesh = unit_box((8, 8), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic"),
                           Unknown("v", "biquadratic"),
                           Unknown("p", "linear")], quad_order="fifth")
    asm.set_volume_form(navier_stokes(("u", "v"), "p", nu=0.1))

    def bc(var, x, grp, t):
        if var == "u":
            return True, (1.0 if x[1] > 1 - 1e-12 else 0.0)
        if var == "v":
            return True, 0.0
        return False, 0.0

    generate_bdc(asm, bc)
    # pressure gauge
    mask = np.asarray(asm.dirichlet_mask).copy()
    vals = np.asarray(asm.dirichlet_values).copy()
    mask[asm.offsets["p"]] = True
    vals[asm.offsets["p"]] = 0.0
    asm.set_dirichlet(mask, vals)
    assemble = asm.make_assemble_fn()
    from femus_tpu.assembly.bc import apply_dirichlet_values
    u0 = jnp.asarray(apply_dirichlet_values(asm, np.zeros(asm.n_dofs)))
    R, data = assemble(u0)
    return asm, asm.op_with(data), R


def _solve(A, R, M, restart=50, max_restarts=8):
    # FGMRES: right preconditioning, so the convergence test (and the Schur
    # approximation quality) is judged on the TRUE residual
    delta, info = fgmres(A.matvec, -R, M=M, tol=1e-8, restart=restart,
                         max_restarts=max_restarts)
    res = float(jnp.linalg.norm(A @ delta + R))
    return delta, int(info.iters), res


@pytest.mark.slow
def test_nested_schur_tree_beats_flat(cavity):
    asm, A, R = cavity
    # flat one-level Schur with Jacobi F-solve (round-1 capability)
    sv, sp = splits_from_offsets(asm, {"vel": ["u", "v"], "p": ["p"]})
    M_flat = schur_fieldsplit(A, sv, sp, jacobi_pc(A, jnp.asarray(sv.idx)),
                              fact="full")
    # recursive tree: Schur node whose velocity child is itself a leaf with
    # a Vanka sub-solver (ASM-within-split), pressure child Jacobi
    tree = FieldSplitNode(
        "root", combine="schur", schur_fact="full", schur_iters=12,
        children=[
            FieldSplitNode("vel", vars=["u", "v"], pc="vanka", iters=2,
                           vanka_block_elems=2),
            FieldSplitNode("press", vars=["p"], pc="jacobi", iters=2),
        ])
    M_tree = build_fieldsplit_tree(A, asm, tree)

    d_flat, it_flat, res_flat = _solve(A, R, M_flat)
    d_tree, it_tree, res_tree = _solve(A, R, M_tree)
    assert res_tree < 1e-6
    # same accuracy as (or better than) the flat split...
    assert res_tree <= res_flat * 1.5 + 1e-12
    # ...with fewer outer iterations thanks to the stronger per-split
    # solver (reference motivation for the recursive tree)
    assert it_tree < it_flat, (it_tree, it_flat)
    if res_flat < 1e-6:      # both converged -> same linear solution
        nref = np.linalg.norm(np.asarray(d_flat))
        assert np.linalg.norm(np.asarray(d_tree - d_flat)) / nref < 1e-5


def test_additive_and_multiplicative_nodes(cavity):
    asm, A, R = cavity
    tree_add = FieldSplitNode(
        "root", combine="multiplicative",
        children=[
            FieldSplitNode("vel", combine="additive", children=[
                FieldSplitNode("u", vars=["u"], pc="cg", iters=6),
                FieldSplitNode("v", vars=["v"], pc="cg", iters=6),
            ]),
            FieldSplitNode("press", vars=["p"], pc="jacobi", iters=3),
        ])
    M = build_fieldsplit_tree(A, asm, tree_add)
    delta, iters, res = _solve(A, R, M, restart=80, max_restarts=10)
    assert res < 1e-6, (iters, res)
