"""Adaptive refinement with multigrid across the AMR level chain.

Reference: applications/AMR + applications/MGAMR (and the AMR branch of
LinearImplicitSystem::MGsolve, LinearImplicitSystem.cpp:529-577, where
_PPamr/_RRamr fold the hanging-node constraints into the transfer chain).

Drive: Poisson with a corner-layer source on the unit square.  Each cycle
solves with the V-cycle preconditioner built ACROSS the AMR levels
(systems/amr.solve_mg_amr — every level assembles on its own mixed-level
mesh, reduces by its hanging constraints, and the transfers are the
embedding prolongation composed with the coarse constraint interpolation),
estimates per-element error with the Kelly gradient-jump indicator, flags
the top fraction, and selectively refines with 1-irregularity closure.

The printout shows the two claims that matter: the error concentrates the
dofs near the layer (dof counts grow far slower than uniform refinement),
and the MG-preconditioned CG iteration counts stay flat as AMR levels pile
up — the mesh-independence property the reference's MGAMR app exercises.
"""
import os

import _common  # noqa: F401
import jax.numpy as jnp
import numpy as np

from femus_tpu.assembly.engine import Unknown
from femus_tpu.assembly.forms import poisson
from femus_tpu.mesh.amr import flag_by_error, refine_selective
from femus_tpu.mesh.generation import unit_box
from femus_tpu.systems.amr import kelly_indicator, solve_mg_amr

FAM = "biquadratic"


def rhs(x):
    # sharp source concentrated at the corner (0, 0)
    r2 = jnp.sum(x * x, axis=-1)
    return jnp.exp(-r2 / 0.005)


def bc(var, x, grp, t):
    return True, 0.0


def main():
    n0 = int(os.environ.get("EX_N", "4"))
    cycles = int(os.environ.get("EX_CYCLES", "3"))
    frac = 0.25

    meshes = [unit_box((n0, n0), "quad")]
    unks = [Unknown("u", FAM)]
    form = poisson("u", FAM, rhs=rhs)
    for cyc in range(cycles + 1):
        u, info = solve_mg_amr(meshes, unks, form, bc)
        m = meshes[-1]
        dm = m.dofmap(FAM)
        eta = kelly_indicator(m, FAM, u[:dm.n_dofs])
        print(f"cycle {cyc}: levels={info['n_levels']} dofs={dm.n_dofs} "
              f"cg_iters={info['iterations']} res={info['residual']:.2e} "
              f"eta={float(np.linalg.norm(eta)):.3e}")
        if cyc < cycles:
            meshes.append(refine_selective(
                m, flag_by_error(eta, frac, mode="fraction")))
    # flat iteration counts = mesh-independent MG across AMR levels
    assert info["iterations"] <= 20, info
    print("final: AMR chain of", len(meshes), "levels,",
          meshes[-1].n_elems, "elements on the finest")


if __name__ == "__main__":
    main()
