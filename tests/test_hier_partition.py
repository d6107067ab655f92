"""ICI/DCN-aware two-level element partition (SURVEY.md §2.4 multi-host:
"partition-time awareness of ICI vs DCN in the element reordering (minimize
DCN-crossing halo)"; reference scales by flat mpirun, MeshMetisPartitioning.cpp:41).
"""
import numpy as np

from femus_tpu.mesh.generation import unit_box
from femus_tpu.parallel.partition import (partition_mesh,
                                          partition_mesh_hierarchical)


def test_hierarchical_reduces_dcn_cut():
    # elongated channel: the cheap host split is across the long axis (12
    # edges); orderings blind to the DCN/ICI distinction pay ~4x that
    mesh = unit_box((48, 12), "quad")
    n_hosts, n_chips = 2, 4

    out, info = partition_mesh_hierarchical(mesh, n_hosts, n_chips,
                                            outer_method="rcb")
    assert info.n_shards == 8
    assert info.dcn_cut >= 0 and info.ici_cut >= 0
    assert info.dcn_cut + info.ici_cut == info.edge_cut

    # DCN-blind baseline: a flat 8-way partition knows nothing about which
    # shards share a host — any shard->host grouping is as likely as any
    # other.  Average the DCN cut over all (8 choose 4)/2 groupings.
    from itertools import combinations
    from femus_tpu.mesh.mesh import elem_neighbors
    flat, finfo = partition_mesh(mesh, 8, method="rcb")
    nbr = elem_neighbors(flat)
    ei, fi = np.nonzero(nbr >= 0)
    a = flat.elem_shard[ei]
    b = flat.elem_shard[nbr[ei, fi]]
    cuts = []
    for host0 in combinations(range(8), 4):
        if 0 not in host0:
            continue
        h = np.zeros(8, int)
        h[list(host0)] = 1
        cuts.append(int(((a != b) & (h[a] != h[b])).sum()) // 2)
    flat_dcn_avg = np.mean(cuts)

    # the deliberate host split pays (much) less DCN halo than the expected
    # DCN-blind grouping, and DCN halo stays below ICI halo
    assert info.dcn_cut < 0.5 * flat_dcn_avg
    assert info.dcn_cut <= info.ici_cut

    # shard-contiguity invariants survive the two-level reorder
    assert np.all(np.diff(out.elem_shard) >= 0)
    sizes = np.diff(info.elem_offsets)
    assert sizes.sum() == mesh.n_elems
    assert sizes.max() <= 2 * sizes.min() + 8   # balanced


def test_hierarchical_mesh_still_assembles():
    """The reordered mesh must remain a valid assembly input."""
    import jax.numpy as jnp
    from femus_tpu.assembly.bc import generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.assembly.norms import error_norms

    mesh = unit_box((8, 8), "quad")
    out, _ = partition_mesh_hierarchical(mesh, 2, 2)
    asm = Assembler(out, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic", rhs=lambda x: (
        2 * np.pi ** 2 * jnp.sin(np.pi * x[:, 0]) * jnp.sin(np.pi * x[:, 1]))))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    R, data = asm.make_assemble_fn()(jnp.zeros(asm.n_dofs_pad))
    A = sp.csr_matrix((np.asarray(data).ravel()[asm.pattern.csr_to_ell_slots()],
                       asm.pattern.indices, asm.pattern.indptr))
    u = spla.spsolve(A.tocsc(), -np.asarray(R))
    err, _ = error_norms(out, "biquadratic", jnp.asarray(u),
                         lambda x: jnp.sin(np.pi * x[:, 0]) * jnp.sin(np.pi * x[:, 1]))
    assert err < 1e-3    # Q2 discretization error on the 8x8 mesh
