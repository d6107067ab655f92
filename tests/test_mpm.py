"""MPM tests: P2G conservation, free fall (exact kinematics), elastic
bounce energy behavior (reference src/ism MPM helpers, MPM_FEM app)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.mesh.generation import unit_box
from femus_tpu.particles.mpm import (MPMState, grid_fields, init_particles,
                                     make_mpm_step, neo_hookean_stress)


def test_p2g_conserves_mass_momentum():
    mesh = unit_box((4, 4), "quad")
    s = init_particles(mesh, lambda x: (x[:, 0] > 0.2) & (x[:, 0] < 0.8)
                       & (x[:, 1] > 0.4) & (x[:, 1] < 0.9),
                       ppc=3, density=2.0,
                       vel_fn=lambda x: np.stack([np.ones(len(x)),
                                                  -2 * np.ones(len(x))], 1))
    mi, mv = grid_fields(mesh, s)
    assert mi.sum() == pytest.approx(float(s.mass.sum()), rel=1e-10)
    assert mv[:, 0].sum() == pytest.approx(float((s.mass * s.v[:, 0]).sum()),
                                           rel=1e-10)
    assert mv[:, 1].sum() == pytest.approx(float((s.mass * s.v[:, 1]).sum()),
                                           rel=1e-10)


def test_free_fall_kinematics():
    """Zero stiffness, gravity only: particles follow exact ballistic motion
    (grid transfer must not alter rigid-body acceleration)."""
    mesh = unit_box((6, 6), "quad")
    s = init_particles(mesh, lambda x: ((x[:, 0] - 0.5) ** 2
                                        + (x[:, 1] - 0.7) ** 2) < 0.02,
                       ppc=3, density=1.0)
    step = make_mpm_step(mesh, neo_hookean_stress(0.0, 0.0),
                         gravity=(0.0, -10.0), flip=1.0)
    dt = 1e-3
    n = 40
    y0 = float(s.x[:, 1].mean())
    for _ in range(n):
        s = step(s, dt)
    t = n * dt
    # v gains g*t each step (explicit symplectic Euler on grid); position
    # integrates v_new: y(t) = y0 - g * dt^2 * n(n+1)/2
    y_exact = y0 - 10.0 * dt * dt * n * (n + 1) / 2
    assert float(s.x[:, 1].mean()) == pytest.approx(y_exact, abs=1e-6)
    assert float(s.v[:, 1].mean()) == pytest.approx(-10.0 * t, rel=1e-8)
    # F stays identity under uniform translation
    I = np.eye(2)
    assert np.abs(np.asarray(s.F) - I).max() < 1e-8


def test_elastic_block_settles_on_floor():
    """Stiff block under gravity on a fixed floor: must not fall through,
    and kinetic energy must stay bounded."""
    mesh = unit_box((8, 8), "quad")
    dm = mesh.dofmap("linear")
    ycoord = mesh.coords[dm.nodes][:, 1]
    fixed = ycoord < 1e-9                  # clamp floor row of grid dofs
    s = init_particles(mesh, lambda x: (x[:, 1] < 0.4) & (x[:, 0] > 0.2)
                       & (x[:, 0] < 0.8), ppc=2, density=1.0)
    step = make_mpm_step(mesh, neo_hookean_stress(50.0, 50.0),
                         gravity=(0.0, -1.0), flip=0.9, fixed_dofs=fixed)
    dt = 2e-3
    for _ in range(150):
        s = step(s, dt)
    x = np.asarray(s.x)
    assert x[:, 1].min() > -0.05           # nothing fell through the floor
    ke = float((s.mass * (s.v ** 2).sum(1)).sum())
    assert ke < 1.0                        # settled, not blown up
    assert np.isfinite(x).all()


def test_deformation_gradient_tracks_stretch():
    """Prescribed linear grid velocity field -> F update matches analytic
    exponential stretch for one step."""
    mesh = unit_box((4, 4), "quad")
    s = init_particles(mesh, lambda x: np.full(len(x), True), ppc=2)
    # velocity field v = (x, -y) has grad v = diag(1, -1)
    step = make_mpm_step(mesh, neo_hookean_stress(0.0, 0.0),
                         gravity=(0.0, 0.0), flip=0.0)
    # hand-set particle velocities to v(x); one zero-gravity step transfers
    # them to the grid and back; F <- (I + dt grad v) F
    s = MPMState(x=s.x, v=jnp.stack([s.x[:, 0] - 0.5, -(s.x[:, 1] - 0.5)], 1),
                 F=s.F, mass=s.mass, vol0=s.vol0, elem=s.elem)
    dt = 1e-2
    s2 = step(s, dt)
    F = np.asarray(s2.F)
    inner = ((np.asarray(s.x)[:, 0] > 0.3) & (np.asarray(s.x)[:, 0] < 0.7)
             & (np.asarray(s.x)[:, 1] > 0.3) & (np.asarray(s.x)[:, 1] < 0.7))
    assert np.allclose(F[inner, 0, 0], 1 + dt, atol=2e-3)
    assert np.allclose(F[inner, 1, 1], 1 - dt, atol=2e-3)
    assert np.allclose(F[inner, 0, 1], 0, atol=2e-3)
