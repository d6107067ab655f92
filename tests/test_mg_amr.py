"""Multigrid ACROSS AMR levels (reference _PPamr/_RRamr,
LinearImplicitSystem.cpp:529-577; MGAMR application).

The AMR chain's hanging constraints are folded into the transfer operators
(P_red = (P_amr C_coarse) restricted to fine free dofs, with the embedding
prolongation taking identity blocks on copied elements); every level
assembles+reduces on its own mesh and the V-cycle runs across the chain.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from femus_tpu.assembly.engine import Unknown
from femus_tpu.mesh.amr import flag_by_error, refine_selective
from femus_tpu.mesh.generation import unit_box
from femus_tpu.systems.amr import (kelly_indicator, solve_conforming,
                                   solve_mg_amr)

pi = np.pi


def exact(x):
    return jnp.sin(pi * x[:, 0]) * jnp.sin(pi * x[:, 1])


def form(ops, u, aux):
    g = ops.grad("biquadratic", u["u"])
    return {"u": ops.tgrad("biquadratic", g)
            - ops.t("biquadratic",
                    ops.pointwise(lambda x: 2 * pi ** 2 * exact(x)))}


def bc(var, x, grp, t):
    return True, 0.0


@pytest.mark.slow
def test_mg_across_amr_levels():
    mesh = unit_box((4, 4), "quad")
    meshes = [mesh]
    unks = [Unknown("u", "biquadratic")]
    iters = []
    for cyc in range(3):
        u, info = solve_mg_amr(meshes, unks, form, bc)
        iters.append(info["iterations"])
        assert info["residual"] < 1e-9
        m = meshes[-1]
        dm = m.dofmap("biquadratic")
        eta = kelly_indicator(m, "biquadratic", u[:dm.n_dofs])
        meshes.append(refine_selective(
            m, flag_by_error(eta, 0.3, mode="fraction")))

    u_mg, info = solve_mg_amr(meshes, unks, form, bc)
    # iteration counts stay essentially flat across AMR cycles
    assert info["iterations"] <= 15, (iters, info)
    # ... and far below the single-level diagonal-CG count
    u_sl, info_sl = solve_conforming(meshes[-1], unks, form, bc)
    assert info["iterations"] < info_sl["iterations"] / 3
    # same conforming solution
    rel = np.linalg.norm(u_mg - np.asarray(u_sl)) / np.linalg.norm(u_sl)
    assert rel < 1e-9, rel
