"""L2 projection of an analytic function onto every FE family.

Reference: applications/000_tutorial/ex01* (function approximation): solve
(u, phi) = (f, phi) per family and report the L2 error.
"""
import os

import _common  # noqa: F401  (path + precision bootstrap)
import jax
import jax.numpy as jnp
import numpy as np

from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.norms import error_norms
from femus_tpu.algebra.krylov import cg
from femus_tpu.mesh.generation import unit_box


def f(x):
    return jnp.sin(jnp.pi * x[:, 0]) * jnp.cos(jnp.pi * x[:, 1])


def project(n, family):
    mesh = unit_box((n, n), "quad")
    asm = Assembler(mesh, [Unknown("u", family)], quad_order="seventh")

    def form(ops, u, aux):
        return {"u": ops.t(family, ops.value(family, u["u"]) - f(ops.x))}

    asm.set_volume_form(form)
    assemble = jax.jit(asm.make_assemble_fn())
    R, data = assemble(jnp.zeros(asm.n_dofs_pad))
    A = asm.op_with(data)
    u, info = cg(A.matvec, -R, M=lambda r: r / A.diagonal(), tol=1e-12,
                 maxiter=400)
    l2, _ = error_norms(mesh, family, u[:asm.n_dofs], f)
    return l2


def main():
    n = int(os.environ.get("EX_N", "8"))
    for family in ("linear", "serendipity", "biquadratic",
                   "disc_constant", "disc_linear"):
        e_c = project(n, family)
        e_f = project(2 * n, family)
        order = np.log2(e_c / e_f)
        print(f"{family:<14} L2 {e_f:.3e}  order {order:.2f}")


if __name__ == "__main__":
    main()
