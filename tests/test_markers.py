"""Marker tracking tests: owner-element location, cross-element advection in
a rigid-rotation field (reference ISM app behavior)."""
import numpy as np
import pytest
import jax.numpy as jnp

from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.mesh import elem_neighbors
from femus_tpu.particles.markers import MarkerCloud, advect, locate


def test_elem_neighbors():
    m = unit_box((3, 3), "quad")
    nb = elem_neighbors(m)
    assert nb.shape == (9, 4)
    # interior element (cell 1,1 in row-major cells) has 4 neighbors
    assert (nb >= 0).sum() == 2 * (2 * 3 * 2)  # 12 interior faces x 2 sides


@pytest.mark.parametrize("geom", ["quad", "tri", "hex", "tet"])
def test_locate(geom):
    dim = 2 if geom in ("quad", "tri") else 3
    m = unit_box((3,) * dim, geom)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.95, size=(40, dim))
    cloud = MarkerCloud(m, pts, np.zeros(40, np.int64))
    locate(cloud)
    assert (cloud.elem >= 0).all()
    # verify containment: marker inside the bounding box of its element
    for k in range(cloud.n):
        c = m.coords[m.conn[cloud.elem[k]]]
        assert np.all(pts[k] >= c.min(axis=0) - 1e-9)
        assert np.all(pts[k] <= c.max(axis=0) + 1e-9)
    # outside point gets parked
    out = MarkerCloud(m, np.array([[2.0] * dim]), np.zeros(1, np.int64))
    locate(out)
    assert out.elem[0] == -1


def test_rigid_rotation_advection():
    """Rotate markers around the unit-square center by pi/2 in a rigid
    rotation velocity field interpolated from a Q2 FE field."""
    m = unit_box((8, 8), "quad")
    dm = m.dofmap("biquadratic")
    xy = m.coords[dm.nodes]
    u = -(xy[:, 1] - 0.5)          # u = -(y-c)
    v = (xy[:, 0] - 0.5)
    pts = np.array([[0.75, 0.5], [0.5, 0.8], [0.3, 0.35]])
    cloud = MarkerCloud(m, pts.copy(), np.zeros(len(pts), np.int64))
    locate(cloud)
    T = np.pi / 2
    advect(cloud, [u, v], ["biquadratic", "biquadratic"], T, n_steps=200, order=4)
    # exact rotation by pi/2 about (0.5, 0.5)
    c = np.array([0.5, 0.5])
    R = np.array([[0.0, -1.0], [1.0, 0.0]])
    want = (pts - c) @ R.T + c
    assert (cloud.elem >= 0).all()
    assert np.allclose(cloud.x, want, atol=2e-4), (cloud.x, want)
