"""3-D hex patch-lattice stencil (mesh/patches3d.py + algebra/patchstencil3d.py)
vs the general ELL operator, including D4 face-orientation handling
(elements deliberately rotated so patch frames disagree across faces)."""
import numpy as np
import pytest
import jax.numpy as jnp

from femus_tpu.assembly.bc import generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import poisson
from femus_tpu.fe.geom import GEOMS
from femus_tpu.mesh.generation import unit_box
from femus_tpu.mesh.patches3d import refine_patched_hex, node_of_3d

pi = np.pi


def _rot_perm(R):
    g = GEOMS["hex"]
    tgt = (R @ g.ref_nodes.T).T
    perm = np.empty(g.n_nodes_bq, np.int64)
    for a in range(g.n_nodes_bq):
        d = np.abs(g.ref_nodes - tgt[a]).sum(axis=1)
        perm[a] = np.argmin(d)
        assert d[perm[a]] < 1e-12
    return perm


def _rotated_box(n=(2, 2, 2)):
    """Box hex mesh with every other element rotated (exercises the D4
    face transforms and edge flips)."""
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    Rx = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], float)
    perms = [_rot_perm(Rz), _rot_perm(Rx), _rot_perm(Rz @ Rx),
             _rot_perm(Rx @ Rx)]
    mesh = unit_box(n, "hex")
    conn = mesh.conn.copy()
    for e in range(mesh.n_elems):
        if e % 2 == 1:
            conn[e] = conn[e][perms[e % len(perms)]]
    mesh.conn = conn
    mesh._dofmaps = {}
    return mesh


def test_numbering_consistency():
    coarse = _rotated_box()
    fine, plan = refine_patched_hex(coarse, 1)
    for e in range(fine.n_elems):
        p = int(plan.elem_patch[e])
        for a in range(27):
            i, j, k = plan.elem_node_lat[e, a]
            assert node_of_3d(plan, p, int(i), int(j), int(k)) == fine.conn[e, a]


@pytest.mark.parametrize("levels", [1, 2])
def test_patch3d_matvec_matches_ell(levels):
    coarse = _rotated_box()
    fine, plan = refine_patched_hex(coarse, levels)
    rhs = lambda x: (3 * pi ** 2 * jnp.sin(pi * x[:, 0])
                     * jnp.sin(pi * x[:, 1]) * jnp.sin(pi * x[:, 2]))
    a_ell = Assembler(fine, [Unknown("u", "biquadratic")], quad_order="fifth")
    a_pat = Assembler(fine, [Unknown("u", "biquadratic")], quad_order="fifth")
    for a in (a_ell, a_pat):
        a.set_volume_form(poisson("u", "biquadratic", rhs=rhs))
        generate_bdc(a, lambda var, x, grp, t: (True, 0.0))
    a_pat.set_patch_layout(plan)

    u0 = jnp.zeros(a_ell.n_dofs_pad)
    R_e, d_e = a_ell.make_assemble_fn()(u0)
    R_p, d_p = a_pat.make_assemble_fn()(u0)
    A_e = a_ell.op_with(d_e)
    A_p = a_pat.op_with(d_p)
    assert np.allclose(np.asarray(R_e), np.asarray(R_p), atol=1e-12)

    rng = np.random.default_rng(1)
    for _ in range(2):
        x = jnp.asarray(rng.standard_normal(a_ell.n_dofs_pad))
        ye = np.asarray(A_e @ x)
        yp = np.asarray(A_p @ x)
        assert np.allclose(ye, yp, atol=1e-9), np.abs(ye - yp).max()
    assert np.allclose(np.asarray(A_e.diagonal()),
                       np.asarray(A_p.diagonal()), atol=1e-9)
