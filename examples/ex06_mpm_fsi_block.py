"""Monolithic implicit MPM-FSI: an elastic block sinking through viscous
fluid (reference applications/MPM_FSI scenario class)."""
import os

import _common  # noqa: F401
import jax.numpy as jnp
import numpy as np

from femus_tpu.mesh.generation import unit_box
from femus_tpu.particles.mpm import init_particles, neo_hookean_stress
from femus_tpu.systems.mpm_fsi import MonolithicMPMFSI


def main():
    n = int(os.environ.get("EX_N", "6"))
    mesh = unit_box((n, n), "quad")

    def bc(var, x, grp, t):
        return (var != "P"), 0.0            # no-slip walls, natural pressure

    fsi = MonolithicMPMFSI(mesh, neo_hookean_stress(50.0, 50.0),
                           rho_s=4.0, rho_f=1.0, mu_f=0.5,
                           bc_fn=bc, dt=0.01, ppe=24, newton_iters=6)
    region = lambda x: ((x[:, 0] > 0.35) & (x[:, 0] < 0.65)
                        & (x[:, 1] > 0.55) & (x[:, 1] < 0.85))
    s = init_particles(mesh, region, ppc=2, density=4.0)
    u = jnp.zeros(fsi.asm.n_dofs_pad)
    print(f"{s.x.shape[0]} material points; stepping...")
    for k in range(10):
        s, u = fsi.step(s, u)
        com = float(jnp.mean(s.x[:, 1]))
        if k % 2 == 1:
            print(f"  step {k+1}: solid center of mass y = {com:.4f}, "
                  f"max grid |v| = {float(jnp.abs(u).max()):.3f}")
    J = np.asarray(jnp.linalg.det(s.F))
    print(f"deformation: det(F) in [{J.min():.3f}, {J.max():.3f}]")


if __name__ == "__main__":
    main()
