"""Native (C++) setup kernels + element partitioning tests
(reference MeshMetisPartitioning.cpp:41-99, Mesh.hpp:451-543)."""
import numpy as np
import pytest

from femus_tpu import native
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.mesh import elem_neighbors
from femus_tpu.parallel.partition import partition_mesh


def test_native_builds():
    assert native.available(), "C++ toolchain should be present in this image"


@pytest.mark.parametrize("method", ["contiguous", "rcb", "graph"])
def test_partition_balance_and_invariants(method):
    m = unit_box((16, 16), "quad")
    pm, info = partition_mesh(m, 4, method=method)
    sizes = np.diff(info.elem_offsets)
    assert sizes.sum() == m.n_elems
    assert sizes.max() <= -(-m.n_elems // 4) * 1.3
    # shard ids contiguous ascending
    assert np.all(np.diff(pm.elem_shard) >= 0)
    assert np.all(np.diff(info.node_shard) >= 0)
    # geometry preserved: total volume via corner shoelace per element
    c = pm.coords[pm.conn[:, :4]]
    area = 0.5 * np.abs(
        (c[:, 0, 0] - c[:, 2, 0]) * (c[:, 1, 1] - c[:, 3, 1])
        - (c[:, 1, 0] - c[:, 3, 0]) * (c[:, 0, 1] - c[:, 2, 1])).sum()
    assert area == pytest.approx(1.0)
    # boundary groups intact
    groups = {int(g) for bf in pm.boundary.values() for g in bf.group}
    assert groups == {1, 2, 3, 4}
    # boundary conn rows really are faces of their element
    for bf in pm.boundary.values():
        for r in range(0, len(bf.elem), 7):
            face_nodes = set(int(v) for v in bf.conn[r])
            elem_nodes = set(int(v) for v in pm.conn[bf.elem[r]])
            assert face_nodes <= elem_nodes


def test_rcb_beats_contiguous_cut():
    m = unit_box((32, 32), "quad")
    _, info_c = partition_mesh(m, 8, method="contiguous")
    _, info_r = partition_mesh(m, 8, method="rcb")
    assert info_r.edge_cut < info_c.edge_cut


def test_partition_solution_unchanged():
    """Solving on the partitioned/reordered mesh gives the same physics."""
    import jax.numpy as jnp
    from femus_tpu.assembly.engine import Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.assembly.norms import error_norms
    from femus_tpu.systems.amr import solve_conforming

    exact = lambda x: jnp.sin(jnp.pi * x[:, 0]) * jnp.sin(jnp.pi * x[:, 1])
    rhs = lambda x: 2 * jnp.pi ** 2 * exact(x)
    bc = lambda var, x, grp, t: (True, 0.0)
    uk = [Unknown("u", "biquadratic")]
    form = poisson("u", "biquadratic", rhs=rhs)
    m = unit_box((8, 8), "quad")
    u1, _ = solve_conforming(m, uk, form, bc)
    l2_1, _ = error_norms(m, "biquadratic", jnp.asarray(u1), exact, None)
    pm, _ = partition_mesh(m, 4, method="rcb")
    u2, _ = solve_conforming(pm, uk, form, bc)
    l2_2, _ = error_norms(pm, "biquadratic", jnp.asarray(u2), exact, None)
    assert float(l2_1) == pytest.approx(float(l2_2), rel=1e-8)


def test_csr_from_coo_matches_scipy():
    import scipy.sparse as sp
    rng = np.random.default_rng(3)
    r = rng.integers(0, 500, 5000)
    c = rng.integers(0, 500, 5000)
    ip, ix = native.csr_from_coo(r, c, 500)
    ms = sp.csr_matrix((np.ones(len(r)), (r, c)), shape=(500, 500))
    ms.sum_duplicates()
    ms.sort_indices()
    assert np.array_equal(ip, ms.indptr)
    assert np.array_equal(ix, ms.indices)


def test_edge_cut_zero_single_part():
    m = unit_box((8, 8), "quad")
    nb = elem_neighbors(m)
    assert native.edge_cut(nb, np.zeros(m.n_elems, np.int32)) == 0


def test_halo_volume_improves_with_rcb():
    """The point of partitioning: fewer cross-shard matrix columns."""
    from femus_tpu.assembly.engine import Assembler, Unknown
    m = unit_box((24, 24), "quad")

    def cross_cols(mesh, n_shards):
        asm = Assembler(mesh, [Unknown("u", "biquadratic")],
                        quad_order="fifth")
        pat = asm.pattern
        n = pat.n_rows
        bounds = np.linspace(0, n, n_shards + 1).astype(int)
        shard_of = np.searchsorted(bounds, np.arange(n), side="right") - 1
        rows = np.repeat(np.arange(n), np.diff(pat.indptr))
        return int(np.sum(shard_of[rows] != shard_of[pat.indices]))

    base = cross_cols(m, 8)
    pm, _ = partition_mesh(m, 8, method="rcb")
    better = cross_cols(pm, 8)
    assert better <= base
