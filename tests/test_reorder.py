"""Mesh RCM renumbering (mesh/reorder.py): locality + physics invariance."""
import jax.numpy as jnp
import numpy as np

from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.multilevel import MultiLevelMesh
from femus_tpu.mesh.reorder import (node_rcm_permutation, rcm_reorder,
                                    rcm_reorder_hierarchy)


def test_rcm_reduces_bandwidth_on_shuffled_mesh():
    mesh = unit_box((12, 12), "quad")
    # destroy locality with a random node permutation
    rng = np.random.default_rng(3)
    from femus_tpu.mesh.reorder import reorder_mesh
    shuffled = reorder_mesh(mesh, rng.permutation(mesh.n_nodes))

    def bandwidth(m):
        c = m.conn
        return int((c.max(axis=1) - c.min(axis=1)).max())

    restored = rcm_reorder(shuffled)
    assert bandwidth(restored) < bandwidth(shuffled) / 3
    # geometry preserved: same multiset of element centroids
    c0 = np.sort(mesh.coords[mesh.conn].mean(axis=1), axis=0)
    c1 = np.sort(restored.coords[restored.conn].mean(axis=1), axis=0)
    np.testing.assert_allclose(c1, c0, atol=1e-12)


def test_rcm_hierarchy_preserves_poisson_solution():
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.assembly.norms import error_norms
    from femus_tpu.systems.problem import MultiLevelProblem
    from femus_tpu.systems.solution import MultiLevelSolution
    from femus_tpu.systems.system import LinearImplicitSystem

    exact = lambda x: jnp.sin(jnp.pi * x[:, 0]) * jnp.sin(jnp.pi * x[:, 1])

    def solve(reorder):
        ml_mesh = MultiLevelMesh(unit_box((4, 4), "quad"), 3)
        if reorder:
            rcm_reorder_hierarchy(ml_mesh)
        ml_sol = MultiLevelSolution(ml_mesh)
        ml_sol.add_solution("u", "biquadratic")
        ml_sol.initialize("u")
        ml_sol.attach_bc(lambda var, x, grp, t: (True, 0.0))
        ml_sol.generate_bdc("u")
        prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
        sys = prob.add_system(LinearImplicitSystem, "Poisson")
        sys.add_unknown("u")
        sys.set_assembly(poisson("u", "biquadratic",
                                 rhs=lambda x: 2 * jnp.pi ** 2 * exact(x)))
        sys.config.outer = "cg"
        sys.config.rtol = 1e-10
        sys.init()
        info = sys.solve()
        l2, _ = error_norms(ml_mesh.finest(), "biquadratic",
                            jnp.asarray(ml_sol.sol[-1]["u"]), exact)
        return l2, info

    l2_ref, _ = solve(False)
    l2_rcm, info = solve(True)
    # identical physics on the renumbered hierarchy (MG transfers included)
    np.testing.assert_allclose(l2_rcm, l2_ref, rtol=1e-8)
    assert info["residual"] < 1e-9
