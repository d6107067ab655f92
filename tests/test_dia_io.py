"""DIA operator correctness + VTK writer round-trip sanity."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.algebra.dia import build_dia_plan
from femus_tpu.assembly.bc import generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import poisson
from femus_tpu.io.vtk import VTKWriter, nodal_field, write_vtu
from femus_tpu.mesh.generation import unit_box
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.mesh.multilevel import MultiLevelMesh


def test_dia_matches_ell():
    mesh = unit_box((8, 8), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    R, data = jax.jit(asm.make_assemble_fn())(jnp.zeros(asm.n_dofs))
    A = asm.op_with(data)
    plan = build_dia_plan(asm.pattern)
    assert plan is not None
    assert len(plan.offsets) <= 45, len(plan.offsets)
    D = plan.apply(data, asm.n_dofs)
    x = jnp.asarray(np.random.default_rng(0).normal(size=asm.n_dofs))
    assert np.allclose(np.asarray(A @ x), np.asarray(D @ x), atol=1e-10)
    assert np.allclose(np.asarray(A.diagonal()), np.asarray(D.diagonal()))


def test_dia_pallas_interpret():
    """Pallas DIA kernel in interpreter mode matches the reference matvec."""
    from femus_tpu.algebra import dia as dia_mod
    from jax.experimental import pallas as pl
    n, K = 1024, 5
    offs = (-33, -1, 0, 1, 33)
    data = jnp.asarray(np.random.default_rng(1).normal(size=(K, n)),
                       jnp.float32)
    op = dia_mod.DiaOp(data, offs, n)
    x = jnp.asarray(np.random.default_rng(2).normal(size=n), jnp.float32)
    want = np.asarray(op @ x)
    import unittest.mock
    orig = pl.pallas_call
    with unittest.mock.patch.object(pl, "pallas_call",
                                    lambda *a, **k: orig(*a, interpret=True, **k)):
        got = np.asarray(dia_mod.spmv_dia_pallas(op, x, tile=256))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_vtk_writer(tmp_path):
    ml_mesh = MultiLevelMesh(unit_box((3, 3), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic")
    ml_sol.add_solution("p", "linear")
    ml_sol.initialize("u", lambda x: x[:, 0] + x[:, 1])
    ml_sol.initialize("p", lambda x: x[:, 0])
    w = VTKWriter(ml_sol)
    path = w.write(str(tmp_path), "u", "p", step=0)
    assert os.path.exists(path)
    txt = open(path).read()
    assert "UnstructuredGrid" in txt and 'Name="u"' in txt and 'Name="p"' in txt
    # nodal lift of linear field reproduces the linear function at all nodes
    vals = nodal_field(ml_mesh.finest(), "linear", ml_sol.sol[-1]["p"])
    assert np.allclose(vals, ml_mesh.finest().coords[:, 0], atol=1e-12)


@pytest.mark.parametrize("geom", ["tri", "hex", "tet", "wedge"])
def test_vtk_other_geoms(tmp_path, geom):
    dim = 2 if geom == "tri" else 3
    ml_mesh = MultiLevelMesh(unit_box((2,) * dim, geom), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("u", "biquadratic")
    ml_sol.initialize("u", lambda x: x[:, 0])
    w = VTKWriter(ml_sol)
    path = w.write(str(tmp_path), "u")
    assert os.path.exists(path)
