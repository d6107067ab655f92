"""Sharded particle clouds: all_to_all migration across an 8-device mesh
(reference: Marker.cpp cross-proc hand-off in GetElement /
Line::AdvectionParallel — SURVEY.md §3.5, §2.4 migration row)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from femus_tpu.mesh.generation import unit_box
from femus_tpu.particles.markers import MarkerCloud, advect, locate
from femus_tpu.particles.sharded import (
    ShardedCloudPlan, collect, distribute, make_plan, make_sharded_advect_fn)


@pytest.fixture(scope="module")
def dmesh():
    from femus_tpu.parallel.spmd import device_mesh
    return device_mesh(8)


def _rotation_cloud(n_cells=8, n_pts=24):
    m = unit_box((n_cells, n_cells), "quad")
    dm = m.dofmap("biquadratic")
    xy = m.coords[dm.nodes]
    u = -(xy[:, 1] - 0.5)
    v = (xy[:, 0] - 0.5)
    rng = np.random.default_rng(3)
    r = rng.uniform(0.1, 0.4, n_pts)
    th = rng.uniform(0, 2 * np.pi, n_pts)
    pts = 0.5 + np.stack([r * np.cos(th), r * np.sin(th)], axis=1)
    cloud = MarkerCloud(m, pts.copy(), np.zeros(n_pts, np.int64))
    locate(cloud)
    assert (cloud.elem >= 0).all()
    return m, cloud, (u, v), pts


def test_migration_matches_unsharded(dmesh):
    m, cloud, (u, v), pts = _rotation_cloud()
    plan = make_plan(m, 8, cloud.n, slack=5.0)
    x, e = distribute(cloud, plan)
    # every particle initially lives on its owner element's shard
    own = plan.elem_owner[np.maximum(np.asarray(e), 0)]
    alive = np.asarray(e) >= 0
    assert (own[alive] == np.repeat(np.arange(8), plan.capacity)[alive]).all()

    step = make_sharded_advect_fn(m, plan, dmesh,
                                  ["biquadratic", "biquadratic"], order=4)
    vd = (jnp.asarray(u), jnp.asarray(v))
    T, n_steps = np.pi / 2, 100
    x = jnp.asarray(x)
    e = jnp.asarray(e)
    total_drops = 0
    for _ in range(n_steps):
        x, e, d = step(x, e, vd, T / n_steps)
        total_drops += int(d)
    assert total_drops == 0

    xs, es = collect(x, e)
    assert len(es) == cloud.n
    # ownership invariant after migration
    own = plan.elem_owner[es]
    shard_of_slot = np.repeat(np.arange(8), plan.capacity)
    e_np = np.asarray(e)
    assert (plan.elem_owner[e_np[e_np >= 0]] ==
            shard_of_slot[e_np >= 0]).all()
    # physical positions match the unsharded advection path
    ref = MarkerCloud(m, pts.copy(), cloud.elem.copy())
    advect(ref, [u, v], ["biquadratic", "biquadratic"], T, n_steps, order=4)
    assert np.allclose(sorted(map(tuple, xs)), sorted(map(tuple, ref.x)),
                       atol=1e-9)


def test_overflow_is_counted(dmesh):
    m, cloud, (u, v), _ = _rotation_cloud(n_pts=24)
    # cap_migrate=1 forces overflow when >1 particle crosses a boundary the
    # same step; run with a big dt so many particles cross at once
    plan = make_plan(m, 8, cloud.n, cap_migrate=1, slack=5.0)
    x, e = distribute(cloud, plan)
    step = make_sharded_advect_fn(m, plan, dmesh,
                                  ["biquadratic", "biquadratic"])
    vd = (jnp.asarray(u), jnp.asarray(v))
    drops = 0
    for _ in range(30):
        x, e, d = step(x, e, vd, 0.2)
        drops += int(d)
    n_alive = int((np.asarray(e) >= 0).sum())
    assert n_alive + drops == cloud.n
