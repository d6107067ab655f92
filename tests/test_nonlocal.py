"""Nonlocal (peridynamic-type) diffusion tests (reference
applications/NonLocal): pair assembly, operator symmetry, local limit."""
import numpy as np
import pytest
import jax.numpy as jnp

from femus_tpu.assembly.nonlocal_diffusion import NonlocalOperator
from femus_tpu.mesh.generation import box, unit_box


def test_operator_symmetric_and_psd():
    m = box((20,), [(0.0, 1.0)], "edge")
    op = NonlocalOperator(m, "linear", delta=0.15, quad_order=5)
    import scipy.sparse as sp
    A = np.zeros((op.pattern.n_rows, op.pattern.n_rows))
    data = np.asarray(op._data)
    for r in range(op.pattern.n_rows):
        for k in range(op.pattern.width):
            if op.pattern.valid[r, k]:
                A[r, op.pattern.cols[r, k]] += data[r, k]
    assert np.abs(A - A.T).max() < 1e-10 * np.abs(A).max()
    w = np.linalg.eigvalsh(A)
    assert w.min() > -1e-8 * w.max()          # PSD (constant in kernel)
    # constants are exactly in the null space
    assert np.abs(A @ np.ones(A.shape[0])).max() < 1e-8 * np.abs(A).max()


@pytest.mark.slow
def test_local_limit_1d():
    """delta -> 0 with mesh refinement: nonlocal solution approaches the
    local Poisson solution (first-order in delta for the sharp-ball
    quadrature)."""
    exact = lambda xx: np.sin(np.pi * xx[:, 0])
    f = lambda xx: jnp.pi ** 2 * jnp.sin(jnp.pi * xx[:, 0])
    errs = []
    for delta, n in ((0.2, 40), (0.1, 80), (0.05, 160)):
        m = box((n,), [(0.0, 1.0)], "edge")
        op = NonlocalOperator(m, "linear", delta=delta, quad_order=6)
        u, info = op.solve_dirichlet(f, lambda xx: exact(xx))
        dm = m.dofmap("linear")
        errs.append(np.abs(u - exact(m.coords[dm.nodes])).max())
    assert errs[0] > errs[1] > errs[2], errs
    assert errs[2] < 6e-3


def test_2d_runs_and_matches_local_shape():
    m = unit_box((12, 12), "quad")
    op = NonlocalOperator(m, "linear", delta=0.18, quad_order=3)
    assert len(op.pairs) > m.n_elems          # interactions beyond self
    f = lambda xx: 2 * jnp.pi ** 2 * jnp.sin(jnp.pi * xx[:, 0]) * jnp.sin(
        jnp.pi * xx[:, 1])
    u, info = op.solve_dirichlet(f, lambda xx: np.zeros(len(xx)))
    dm = m.dofmap("linear")
    x = m.coords[dm.nodes]
    exact = np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1])
    # collar forces zero near the boundary; compare shape in the core
    core = (x[:, 0] > 0.3) & (x[:, 0] < 0.7) & (x[:, 1] > 0.3) & (x[:, 1] < 0.7)
    ratio = u[core] / exact[core]
    assert np.isfinite(u).all()
    assert ratio.std() / ratio.mean() < 0.15   # shape matches up to scale
