"""Lagrangian markers in a rotating flow with magnetic capture.

Reference: applications/ISM (marker advection ex1-ex5 + the
magnetic_force_test / magnetic_stents capture scenario).
"""
import _common  # noqa: F401
import numpy as np

from femus_tpu.mesh.generation import unit_box
from femus_tpu.particles.forces import magnetic_force, wire_H
from femus_tpu.particles.markers import MarkerCloud, advect, locate


def main():
    mesh = unit_box((8, 8), "quad")
    dm = mesh.dofmap("biquadratic")
    xy = mesh.coords[dm.nodes]
    u = -0.2 * (xy[:, 1] - 0.5)              # slow rotation about center
    v = 0.2 * (xy[:, 0] - 0.5)
    rng = np.random.default_rng(0)
    pts = 0.5 + rng.uniform(-0.25, 0.25, size=(50, 2))
    cloud = MarkerCloud(mesh, pts.copy(), np.zeros(len(pts), np.int64))
    locate(cloud)

    H = wire_H([0.95, 0.5, 0.0], [0.0, 0.0, 1.0], I=1.857e5)
    fm0 = magnetic_force(H, D=2e-4, mu_f=3.5e-3, dim=2)

    def fm(x):
        # drag-limited drift: clip the capture velocity so markers park at
        # the wire instead of overshooting through it in one step
        import jax.numpy as jnp
        f = fm0(x)
        n = jnp.linalg.norm(f) + 1e-30
        return f * jnp.minimum(1.0, 0.5 / n)
    d0 = np.linalg.norm(cloud.x - [0.95, 0.5], axis=1).mean()
    advect(cloud, [u, v], ["biquadratic"] * 2, T=4.0, n_steps=200,
           order=4, force_fn=fm)
    d1 = np.linalg.norm(cloud.x - [0.95, 0.5], axis=1).mean()
    captured = (np.linalg.norm(cloud.x - [0.95, 0.5], axis=1) < 0.15).sum()
    print(f"mean distance to wire: {d0:.3f} -> {d1:.3f}; "
          f"{captured}/{cloud.n} markers within capture radius; "
          f"{(cloud.elem >= 0).sum()} still in domain")


if __name__ == "__main__":
    main()
