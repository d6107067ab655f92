"""Solid constitutive models (reference Solid.cpp:62-95 registry and the
FSI assembly stress branches, FSISteadyStateAssembly.hpp:448-553)."""
import numpy as np
import jax.numpy as jnp
import pytest

from femus_tpu.systems.constitutive import (MODEL_IDS, cauchy_stress,
                                            first_piola)

MODELS = ["saint-venant", "neo-hookean", "neo-hookean-bw",
          "neo-hookean-bw-penalty", "neo-hookean-ab-penalty",
          "mooney-rivlin"]


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("model", MODELS)
def test_small_strain_deviatoric_consistency(model, dim):
    """All finite-strain models linearize to dev(sigma) = 2 mu dev(e):
    the shear modulus is the model-independent material datum."""
    rng = np.random.default_rng(3)
    mu, lam = 7.3, 11.0
    eps = 1e-6
    G = jnp.asarray(eps * rng.standard_normal((5, dim, dim)))
    sig = np.asarray(cauchy_stress(model, G, mu, lam, p=None,
                                   incompressible=False))
    e = 0.5 * (np.asarray(G) + np.swapaxes(np.asarray(G), 1, 2))
    want = 2.0 * mu * e
    # compare in-plane deviatoric parts (in-plane trace removed)
    dev_got = sig - (np.trace(sig, axis1=1, axis2=2) / dim)[:, None, None] \
        * np.eye(dim)
    dev_want = want - (np.trace(want, axis1=1, axis2=2) / dim)[:, None, None] \
        * np.eye(dim)
    assert np.allclose(dev_got, dev_want, atol=50 * eps * eps * mu), model


@pytest.mark.parametrize("model", MODELS)
def test_plane_strain_embedding(model):
    """2-D input = in-plane block of the 3-D zero-padded computation
    (the reference always computes 3x3 with F_33 = 1)."""
    rng = np.random.default_rng(5)
    G2 = 0.1 * rng.standard_normal((4, 2, 2))
    G3 = np.zeros((4, 3, 3))
    G3[:, :2, :2] = G2
    p = jnp.asarray(rng.standard_normal(4))
    s2 = np.asarray(cauchy_stress(model, jnp.asarray(G2), 2.0, 3.0, p=p))
    s3 = np.asarray(cauchy_stress(model, jnp.asarray(G3), 2.0, 3.0, p=p))
    assert np.allclose(s2, s3[:, :2, :2], rtol=1e-12)


def test_first_piola_pullback():
    """P = J sigma F^{-T}  <=>  P F^T = J sigma (Kirchhoff stress)."""
    rng = np.random.default_rng(7)
    G = jnp.asarray(0.2 * rng.standard_normal((6, 3, 3)))
    P = np.asarray(first_piola("neo-hookean-bw-penalty", G, 2.0, 5.0))
    sig = np.asarray(cauchy_stress("neo-hookean-bw-penalty", G, 2.0, 5.0))
    F = np.eye(3) + np.asarray(G)
    J = np.linalg.det(F)
    tau = np.einsum("qik,qjk->qij", P, F)
    assert np.allclose(tau, J[:, None, None] * sig, rtol=1e-10)


def test_model_registry_matches_reference():
    """Name -> model ids as in Solid.cpp:62-95."""
    assert MODEL_IDS["saint-venant"] == 0
    assert MODEL_IDS["neo-hookean"] == 1
    assert MODEL_IDS["neo-hookean-bw"] == 2
    assert MODEL_IDS["neo-hookean-bw-penalty"] == 3
    assert MODEL_IDS["neo-hookean-ab-penalty"] == 4
    assert MODEL_IDS["mooney-rivlin"] == 5


@pytest.mark.parametrize("model", ["neo-hookean-bw-penalty",
                                   "neo-hookean-ab-penalty",
                                   "mooney-rivlin"])
def test_homogeneous_deformation_equilibrium(model):
    """Affine Dirichlet data u = (F0 - I) x gives constant P, hence an exact
    discrete equilibrium: Newton must reproduce the affine field in the
    interior for every constitutive model."""
    from femus_tpu.assembly.forms import elasticity
    from femus_tpu.mesh.generation import unit_box
    from femus_tpu.mesh.multilevel import MultiLevelMesh
    from femus_tpu.systems.problem import MultiLevelProblem
    from femus_tpu.systems.solution import MultiLevelSolution
    from femus_tpu.systems.system import NonLinearImplicitSystem

    F0 = np.array([[1.06, 0.03], [-0.02, 0.95]])

    ml_mesh = MultiLevelMesh(unit_box((3, 3), "quad"), 1)
    ml_sol = MultiLevelSolution(ml_mesh)
    ml_sol.add_solution("dx", "biquadratic")
    ml_sol.add_solution("dy", "biquadratic")

    def bc(var, x, grp, t):
        k = 0 if var == "dx" else 1
        return True, float((F0 - np.eye(2))[k] @ x[:2])

    ml_sol.attach_bc(bc)
    for v in ("dx", "dy"):
        ml_sol.initialize(v)
    ml_sol.generate_bdc()
    prob = MultiLevelProblem(ml_mesh, ml_sol, quad_order="fifth")
    sys = prob.add_system(NonLinearImplicitSystem, "Solid")
    sys.add_unknown("dx", "dy")
    sys.set_assembly(elasticity(("dx", "dy"), model=model, lam=3.0, mu=2.0))
    sys.config.outer = "gmres"
    sys.config.use_mg = False
    sys.config.rtol = 1e-13
    sys.config.nonlinear_tol = 1e-11
    sys.init()
    sys.solve()
    mesh = ml_mesh.finest()
    nodes = mesh.coords
    for k, v in enumerate(("dx", "dy")):
        got = np.asarray(prob.ml_sol.sol[-1][v])
        want = nodes[:, :2] @ (F0 - np.eye(2))[k]
        assert np.allclose(got, want, atol=1e-8), (model, v)
