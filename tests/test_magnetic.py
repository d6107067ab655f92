"""Magnetophoretic marker forces (reference applications/ISM
magnetic_force_test.cpp:80-526): elliptic integrals, wire/loop fields,
force law, and force-driven advection."""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.special as sps

from femus_tpu.particles.forces import (ellipk_ellipe, loop_H, magnetic_force,
                                        wire_H, MU0)


def test_elliptic_agm_matches_scipy():
    m = jnp.asarray(np.linspace(0.0, 0.95, 40))
    K, E = ellipk_ellipe(m)
    np.testing.assert_allclose(np.asarray(K), sps.ellipk(np.asarray(m)),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(E), sps.ellipe(np.asarray(m)),
                               rtol=1e-12)


def test_loop_on_axis_field():
    """On the symmetry axis the loop field reduces to
    H_z = I a^2 / (2 (a^2+z^2)^{3/2}) — the same sanity check the reference
    main() prints (magnetic_force_test.cpp:141-143)."""
    a, I = 0.04, 1.857e5
    H = loop_H([0.0, 0.0, 0.0], [0.0, 0.0, 1.0], a, I)
    for z in (0.0, 0.01, 0.05, -0.03):
        want = I * a * a / (2.0 * (a * a + z * z) ** 1.5)
        got = float(H(jnp.asarray([0.0, 0.0, z])))
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_loop_field_continuous_off_axis():
    a, I = 0.04, 1.857e5
    H = loop_H([0.0, 0.0, 0.0], [0.0, 0.0, 1.0], a, I)
    h0 = float(H(jnp.asarray([1e-7, 0.0, 0.02])))
    h1 = float(H(jnp.asarray([0.0, 0.0, 0.02])))
    np.testing.assert_allclose(h0, h1, rtol=1e-4)


def test_wire_grad_matches_fd():
    """jax.grad of H^2 (what replaces the reference's hand-written gradient,
    :199-222) against central finite differences."""
    H = wire_H([0.4, 0.0, 0.0], [0.0, 0.0, 1.0], 1.857e5)
    Hsq = lambda x: H(x) ** 2
    g = jax.grad(Hsq)
    x = jnp.asarray([0.1, 0.05, 0.02])
    eps = 1e-6
    for d in range(3):
        e = jnp.zeros(3).at[d].set(eps)
        fd = (Hsq(x + e) - Hsq(x - e)) / (2 * eps)
        np.testing.assert_allclose(float(g(x)[d]), float(fd), rtol=1e-6)


def test_force_is_attractive_toward_wire():
    H = wire_H([0.5, 0.5, 0.0], [0.0, 0.0, 1.0], 1.857e5)
    f = magnetic_force(H, dim=2)
    x = jnp.asarray([0.2, 0.5])
    F = np.asarray(f(x))
    # pointing toward the wire (positive x direction)
    assert F[0] > 0 and abs(F[1]) < 1e-12 * abs(F[0]) + 1e-30


def test_saturated_branch():
    """Very close to the wire H > Msat/chi: the force switches to the
    grad(H) law (reference :500-510); both branches are finite."""
    H = wire_H([0.0, 0.0, 0.0], [0.0, 0.0, 1.0], 1.857e5)
    f = magnetic_force(H)
    near = np.asarray(f(jnp.asarray([1e-3, 0.0, 0.0])))
    far = np.asarray(f(jnp.asarray([0.3, 0.0, 0.0])))
    assert np.isfinite(near).all() and np.isfinite(far).all()
    assert float(H(jnp.asarray([1e-3, 0.0, 0.0]))) > 1e6 / 3.0
    assert float(H(jnp.asarray([0.3, 0.0, 0.0]))) < 1e6 / 3.0


def test_markers_drift_to_wire():
    """Quiescent fluid + magnetic force: markers drift toward the wire
    (the magnetic_stents capture scenario)."""
    from femus_tpu.mesh.generation import unit_box
    from femus_tpu.particles.markers import MarkerCloud, advect, locate

    m = unit_box((6, 6), "quad")
    dm = m.dofmap("biquadratic")
    nd = len(dm.nodes)
    zeros = np.zeros(nd)
    H = wire_H([0.9, 0.5, 0.0], [0.0, 0.0, 1.0], I=1.857e5)
    # D = 100 um so the drift is visible over a short advection window
    f = magnetic_force(H, D=1e-4, mu_f=3.5e-3, dim=2)
    pts = np.array([[0.3, 0.45], [0.4, 0.6], [0.5, 0.35]])
    cloud = MarkerCloud(m, pts.copy(), np.zeros(3, np.int64))
    locate(cloud)
    d0 = np.linalg.norm(cloud.x - [0.9, 0.5], axis=1)
    advect(cloud, [zeros, zeros], ["biquadratic"] * 2, T=10.0, n_steps=40,
           order=2, force_fn=f)
    d1 = np.linalg.norm(cloud.x - [0.9, 0.5], axis=1)
    assert (cloud.elem >= 0).all()
    assert (d1 < d0).all(), (d0, d1)
