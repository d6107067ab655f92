"""UQ tests: orthonormality of PCE bases, projection accuracy, sparse-grid
density estimation."""
import numpy as np
import pytest

from femus_tpu.uq.pce import (multivariate_polys, pce_project, polys_1d,
                              quadrature_1d, stochastic_mass_matrix,
                              tensor_product_set, total_degree_set,
                              triple_product_tensor)
from femus_tpu.uq.sparse_grid import avg_l2_error, fit_pdf


@pytest.mark.parametrize("kind", ["hermite", "legendre"])
def test_orthonormality(kind):
    iset = total_degree_set(2, 3)
    G = stochastic_mass_matrix(kind, iset, 12)
    assert np.allclose(G, np.eye(len(iset)), atol=1e-10)


@pytest.mark.parametrize("kind", ["hermite", "legendre"])
def test_quadrature_moments(kind):
    x, w = quadrature_1d(kind, 8)
    assert np.isclose(w.sum(), 1.0)
    assert np.isclose(w @ x, 0.0, atol=1e-12)
    var = w @ x ** 2
    assert np.isclose(var, 1.0 if kind == "hermite" else 1.0 / 3.0)


def test_pce_projection_exact_poly():
    """A degree-2 polynomial is reproduced exactly by a degree-2 PCE."""
    iset = total_degree_set(2, 2)
    f = lambda x: 1.0 + 2 * x[:, 0] + 3 * x[:, 0] * x[:, 1] - x[:, 1] ** 2
    c = pce_project("hermite", iset, f, 8)
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(50, 2))
    P = multivariate_polys("hermite", iset, pts)
    assert np.allclose(c @ P, f(pts), atol=1e-10)


def test_triple_product_symmetry():
    iset = total_degree_set(1, 3)
    C = triple_product_tensor("legendre", iset, 10)
    assert np.allclose(C, C.transpose(1, 0, 2))
    assert np.allclose(C, C.transpose(0, 2, 1))
    # E[Psi_0 Psi_j Psi_k] = delta_jk (Psi_0 = 1)
    assert np.allclose(C[0], np.eye(len(iset)), atol=1e-12)


def test_tensor_set_counts():
    assert len(tensor_product_set(3, 4)) == 64
    assert len(total_degree_set(2, 3)) == 10


def test_sparse_grid_density_1d():
    rng = np.random.default_rng(0)
    samples = rng.normal(0.0, 1.0, size=(40000, 1))
    pdf = fit_pdf(samples, max_level=5, bounds=np.array([[-4.0, 4.0]]))
    true = lambda x: np.exp(-x[:, 0] ** 2 / 2) / np.sqrt(2 * np.pi)
    err = avg_l2_error(pdf, true, 4000)
    assert err < 0.05, err
    # pointwise sanity at the mode
    got = pdf.evaluate(np.array([[0.0]]))[0]
    assert abs(got - 1 / np.sqrt(2 * np.pi)) < 0.05


def test_sparse_grid_density_2d():
    rng = np.random.default_rng(1)
    samples = rng.normal(0.0, 1.0, size=(60000, 2))
    pdf = fit_pdf(samples, max_level=4, bounds=np.array([[-4.0, 4.0]] * 2))
    true = lambda x: np.exp(-(x ** 2).sum(1) / 2) / (2 * np.pi)
    err = avg_l2_error(pdf, true, 4000)
    assert err < 0.08, err
