"""Stochastic Poisson via polynomial chaos + sparse-grid PDF estimation.

Reference: applications/UQ (src/uq Hermite/Legendre PCE tables,
sparseGrid.hpp density estimation).
"""
import _common  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.bc import generate_bdc
from femus_tpu.algebra.krylov import cg
from femus_tpu.mesh.generation import unit_box
from femus_tpu.uq.pce import (pce_project, quadrature_1d, total_degree_set,
                              multivariate_polys)
from femus_tpu.uq.sparse_grid import fit_pdf


def solve_poisson(log_kappa):
    """u(0.5, 0.5) for -div(e^xi grad u) = 1, homogeneous Dirichlet."""
    mesh = unit_box((8, 8), "quad")
    fam = "biquadratic"
    asm = Assembler(mesh, [Unknown("u", fam)], quad_order="fifth")
    kap = float(np.exp(log_kappa))

    def form(ops, u, aux):
        g = ops.grad(fam, u["u"])
        one = ops.pointwise(lambda x: 1.0 + 0.0 * x[..., 0])
        return {"u": kap * ops.tgrad(fam, g) - ops.t(fam, one)}

    asm.set_volume_form(form)
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    R, data = jax.jit(asm.make_assemble_fn())(jnp.zeros(asm.n_dofs_pad))
    A = asm.op_with(data)
    u, _ = cg(A.matvec, -R, M=lambda r: r / A.diagonal(), tol=1e-12,
              maxiter=500)
    xy = mesh.coords[mesh.dofmap(fam).nodes]
    i = np.argmin(np.abs(xy - 0.5).sum(axis=1))
    return float(u[i])


def main():
    # PCE of xi -> u_center(xi), xi ~ N(0, 0.5^2) via Hermite chaos
    idx = total_degree_set(1, 4)
    coeffs = pce_project(
        "hermite", idx,
        lambda pts: np.array([solve_poisson(0.5 * p[0]) for p in pts]),
        nq_1d=7)
    mean = coeffs[0]
    var = float(np.sum(np.asarray(coeffs[1:]) ** 2))
    print(f"PCE: E[u_c] = {mean:.5f}, Var[u_c] = {var:.3e}")

    # Monte-Carlo samples through the PCE surrogate -> sparse-grid PDF
    rng = np.random.default_rng(0)
    xi = rng.normal(0, 1, 4000)
    vals = np.asarray(coeffs) @ multivariate_polys("hermite", idx, xi[:, None])
    pdf = fit_pdf(vals[:, None], max_level=4)
    lo, hi = vals.min(), vals.max()
    grid = np.linspace(lo, hi, 5)[1:-1]
    dens = [float(pdf.evaluate(np.array([[g]]))[0]) for g in grid]
    print("sparse-grid PDF at", [f"{g:.3f}" for g in grid], "=",
          [f"{d:.2f}" for d in dens])


if __name__ == "__main__":
    main()
