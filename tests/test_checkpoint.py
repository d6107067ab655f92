"""Checkpoint/resume (reference: MultiLevelSolution SaveSolution/LoadSolution
+ Files::ConfigureRestart restart bookkeeping — SURVEY.md §5.4)."""
import numpy as np
import pytest

from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.systems.solution import MultiLevelSolution
from femus_tpu.utils.checkpoint import (
    CheckpointManager, capture_particles, capture_solution,
    restore_particles, restore_solution)


def _ml_sol():
    mm = MultiLevelMesh(unit_box((3, 3), "quad"), n_levels=2)
    ms = MultiLevelSolution(mm)
    ms.add_solution("u", "biquadratic")
    ms.add_solution("p", "linear")
    for l in range(2):
        for k in ms.sol[l]:
            ms.sol[l][k][:] = np.random.default_rng(l).normal(
                size=ms.sol[l][k].shape)
    return ms


@pytest.mark.parametrize("use_orbax", [False, True])
def test_roundtrip(tmp_path, use_orbax):
    ms = _ml_sol()
    ref = {l: {k: v.copy() for k, v in ms.sol[l].items()} for l in range(2)}
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2,
                            use_orbax=use_orbax)
    state = {"solution": capture_solution(ms), "time": np.asarray(1.5)}
    mgr.save(3, state)
    mgr.save(7, state)
    assert mgr.latest_step() == 7

    for l in range(2):
        for k in ms.sol[l]:
            ms.sol[l][k][:] = 0.0
    back = mgr.restore()
    restore_solution(ms, back["solution"])
    assert float(np.asarray(back["time"])) == 1.5
    for l in range(2):
        for k in ms.sol[l]:
            np.testing.assert_allclose(ms.sol[l][k], ref[l][k])


def test_retention(tmp_path):
    ms = _ml_sol()
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2,
                            use_orbax=False)
    st = {"solution": capture_solution(ms)}
    for s in (1, 2, 3, 4):
        mgr.save(s, st)
    assert mgr.latest_step() == 4
    with pytest.raises(FileNotFoundError):
        CheckpointManager(str(tmp_path / "empty"), use_orbax=False).restore()


def test_particles_roundtrip(tmp_path):
    from femus_tpu.particles.markers import MarkerCloud
    mesh = unit_box((3, 3), "quad")
    x = np.random.default_rng(0).uniform(0.1, 0.9, size=(16, 2))
    cloud = MarkerCloud(mesh=mesh, x=x, elem=np.zeros(16, np.int32))
    snap = capture_particles(cloud)
    mgr = CheckpointManager(str(tmp_path / "ck"), use_orbax=False)
    mgr.save(0, {"cloud": snap})
    back = mgr.restore(0)
    cloud2 = restore_particles(cloud, back["cloud"])
    np.testing.assert_allclose(cloud2.x, x)
