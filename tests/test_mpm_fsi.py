"""Monolithic implicit MPM-FSI (reference applications/MPM_FSI): engine
particle-form hook correctness + a sinking elastic block integration test."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from femus_tpu.mesh.generation import unit_box
from femus_tpu.particles.mpm import init_particles, neo_hookean_stress
from femus_tpu.systems.mpm_fsi import MonolithicMPMFSI


def _noslip(var, x, grp, t):
    if var == "P":
        return False, 0.0
    return True, 0.0


def test_particle_form_jacobian_matches_fd():
    """The engine's jacfwd of the particle form equals finite differences."""
    mesh = unit_box((3, 3), "quad")
    fsi = MonolithicMPMFSI(mesh, neo_hookean_stress(5.0, 5.0),
                           rho_s=2.0, rho_f=1.0, mu_f=0.1,
                           bc_fn=_noslip, dt=0.05, ppe=8)
    s = init_particles(mesh, lambda x: (x[:, 0] > 0.3) & (x[:, 0] < 0.7)
                       & (x[:, 1] > 0.4), ppc=2, density=2.0)
    rng = np.random.default_rng(0)
    s.v = jnp.asarray(rng.normal(0, 0.1, size=s.v.shape))
    phi, gphi = fsi._shape_at(s.x, s.elem)
    payload = {"phi": phi, "gphi": gphi, "F": s.F, "vol0": s.vol0,
               "mass": s.mass, "v_old": s.v}
    tables = dict(fsi._tables)
    tables["particles"] = fsi.asm.particle_tables(
        np.asarray(s.elem), payload, fsi.ppe)
    aux_fields = {vn + "_old": jnp.zeros(fsi.asm.dofmaps[vn].n_dofs)
                  for vn in fsi.vel_names}
    aux_scalars = {"dt": jnp.asarray(0.05)}
    u0 = jnp.asarray(rng.normal(0, 0.1, size=fsi.asm.n_dofs_pad))
    u0 = jnp.where(jnp.asarray(fsi.asm.dirichlet_mask), 0.0, u0)
    R0, data = fsi._assemble(u0, tables, aux_fields, aux_scalars)
    pat = fsi.asm.pattern
    A = np.zeros((pat.n_rows, pat.n_rows))
    rows = np.repeat(np.arange(pat.n_rows), pat.width)
    np.add.at(A, (rows, pat.cols.ravel()), np.asarray(data).ravel())
    eps = 1e-6
    free = ~np.asarray(fsi.asm.dirichlet_mask)
    cols = np.where(free)[0][::7][:40]
    for j in cols:
        Rp, _ = fsi._assemble(u0.at[j].add(eps), tables, aux_fields,
                              aux_scalars)
        fd = (np.asarray(Rp) - np.asarray(R0)) / eps
        np.testing.assert_allclose(A[:, j], fd, rtol=2e-4, atol=5e-4)


def test_neutral_particles_are_noop():
    """rho_s = rho_f and zero solid stress: the particle terms vanish and the
    grid system equals the particle-free fluid system."""
    mesh = unit_box((3, 3), "quad")
    fsi = MonolithicMPMFSI(mesh, lambda F: jnp.zeros_like(F),
                           rho_s=1.0, rho_f=1.0, mu_f=0.1,
                           bc_fn=_noslip, dt=0.05, ppe=8)
    s = init_particles(mesh, lambda x: x[:, 1] > 0.5, ppc=2, density=1.0)
    phi, gphi = fsi._shape_at(s.x, s.elem)
    payload = {"phi": phi, "gphi": gphi, "F": s.F, "vol0": s.vol0,
               "mass": s.mass, "v_old": s.v}
    t_with = dict(fsi._tables)
    t_with["particles"] = fsi.asm.particle_tables(
        np.asarray(s.elem), payload, fsi.ppe)
    aux_fields = {vn + "_old": jnp.zeros(fsi.asm.dofmaps[vn].n_dofs)
                  for vn in fsi.vel_names}
    aux_scalars = {"dt": jnp.asarray(0.05)}
    rng = np.random.default_rng(1)
    u0 = jnp.asarray(rng.normal(0, 0.1, size=fsi.asm.n_dofs_pad))
    R1, d1 = fsi._assemble(u0, t_with, aux_fields, aux_scalars)
    R2, d2 = fsi._assemble(u0, fsi._tables, aux_fields, aux_scalars)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)


def test_sinking_block():
    """A heavy neo-Hookean block immersed in light viscous fluid under
    gravity sinks; particles stay in the domain, F stays invertible, and
    the monolithic Newton converges each step."""
    mesh = unit_box((6, 6), "quad")
    fsi = MonolithicMPMFSI(mesh, neo_hookean_stress(50.0, 50.0),
                           rho_s=4.0, rho_f=1.0, mu_f=0.5,
                           bc_fn=_noslip, dt=0.01, ppe=20,
                           gravity=(0.0, -9.81), newton_iters=6)
    region = lambda x: ((x[:, 0] > 0.35) & (x[:, 0] < 0.65)
                        & (x[:, 1] > 0.55) & (x[:, 1] < 0.85))
    s = init_particles(mesh, region, ppc=2, density=4.0)
    n0 = s.x.shape[0]
    com0 = float(jnp.mean(s.x[:, 1]))
    u = jnp.zeros(fsi.asm.n_dofs_pad)
    for _ in range(6):
        s, u = fsi.step(s, u)
    com1 = float(jnp.mean(s.x[:, 1]))
    assert s.x.shape[0] == n0
    assert (np.asarray(s.elem) >= 0).all()
    assert com1 < com0 - 1e-4, (com0, com1)
    J = np.asarray(jnp.linalg.det(s.F))
    assert (J > 0.5).all() and (J < 2.0).all()
    # fluid reacts: grid velocity field is nonzero below the block
    assert float(jnp.max(jnp.abs(u))) > 1e-6
