"""Sharded transient Navier-Stokes + Lagrangian marker advection with a
mid-run checkpoint/restore — the integration seam of three subsystems that
are otherwise tested piecewise:

- halo-exchanged sharded assembly + solve per time step
  (parallel/spmd.make_sharded_step over the virtual device mesh; the
  reference's per-rank owner-computes loop + PETSc ghost updates),
- sharded marker advection with all_to_all migration in the freshly
  computed velocity field (particles/sharded.make_sharded_advect_fn;
  reference Line::AdvectionParallel, ism/Line.cpp),
- checkpoint at mid-run + restore into a FRESH run that must land on the
  exact same final state (utils/checkpoint; reference SaveSolution /
  Files::ConfigureRestart restart bookkeeping).

Run: python examples/ex10_sharded_transient_particles.py
Env: EX_N (mesh cells/axis, default 8), EX_STEPS (default 6).
"""
import os

# 8 virtual CPU devices BEFORE jax initializes (the no-cluster distributed
# backend, SURVEY.md §4) — must precede _common's jax import
_f = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _f:
    os.environ["XLA_FLAGS"] = (
        _f + " --xla_force_host_platform_device_count=8").strip()

import _common  # noqa: F401,E402

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from femus_tpu.assembly.bc import apply_dirichlet_values, generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import navier_stokes
from femus_tpu.mesh.generation import unit_box
from femus_tpu.parallel.spmd import device_mesh, make_sharded_step
from femus_tpu.particles.sharded import (collect, distribute, make_plan,
                                         make_sharded_advect_fn)
from femus_tpu.particles.markers import MarkerCloud, locate
from femus_tpu.utils.checkpoint import CheckpointManager

DT = 0.05
NU = 0.05


def transient_ns_form(dt=DT, nu=NU):
    """Backward-Euler NS: (u - u_old)/dt + steady NS terms."""
    steady = navier_stokes(("u", "v"), "p", nu=nu)

    def form(ops, u, aux):
        out = steady(ops, u, aux)
        for c in ("u", "v"):
            du = (ops.value("biquadratic", u[c])
                  - ops.value("biquadratic", aux[c + "_old"])) / dt
            out[c] = out[c] + ops.t("biquadratic", du)
        return out

    return form


def build(n, n_dev):
    asm = Assembler(unit_box((n, n), "quad"),
                    [Unknown("u", "biquadratic"), Unknown("v", "biquadratic"),
                     Unknown("p", "linear")],
                    quad_order="fifth", pad_dofs_to=n_dev,
                    pad_elems_to=n_dev)
    for c in ("u", "v"):
        asm.add_aux_field(c + "_old", "biquadratic")
    asm.set_volume_form(transient_ns_form())

    def bc(var, x, grp, t):
        if var == "p":
            return False, 0.0
        if var == "u" and abs(x[1] - 1.0) < 1e-9:
            return True, 1.0                  # lid starts moving at t=0
        return True, 0.0

    generate_bdc(asm, bc)
    asm.dirichlet_mask[asm.offsets["p"]] = True
    return asm


def run(n, n_steps, n_dev, ckpt_dir=None, restore_at=None, state0=None):
    """March n_steps; optionally checkpoint at step ``restore_at`` or start
    from ``state0`` (step index, u, marker x, marker elem)."""
    dmesh = device_mesh(n_dev)
    asm = build(n, n_dev)
    step = make_sharded_step(asm, dmesh, outer="gmres", rtol=1e-10,
                             restart=60, max_outer=5, smoother="jacobi",
                             with_aux=True)
    mesh = asm.mesh
    plan = make_plan(mesh, n_dev, n_particles=64)
    advect = make_sharded_advect_fn(mesh, plan, dmesh,
                                    ["biquadratic", "biquadratic"], order=2)
    off_u, off_v = asm.offsets["u"], asm.offsets["v"]
    ndv = asm.dofmaps["u"].n_dofs

    if state0 is None:
        first, u = 0, jnp.asarray(
            apply_dirichlet_values(asm, np.zeros(asm.n_dofs_pad)))
        rng = np.random.default_rng(42)
        pts = 0.5 + rng.uniform(-0.3, 0.3, size=(40, 2))
        cloud = MarkerCloud(mesh, pts.copy(), np.zeros(len(pts), np.int64))
        locate(cloud)
        px, pe = distribute(cloud, plan)
    else:
        first, u, px, pe = state0
        u, px, pe = jnp.asarray(u), jnp.asarray(px), jnp.asarray(pe)
    u = jax.device_put(u, NamedSharding(dmesh, P("mesh")))

    mgr = CheckpointManager(ckpt_dir) if ckpt_dir else None
    for it in range(first, n_steps):
        u_old = {c + "_old": u[o:o + ndv]
                 for c, o in (("u", off_u), ("v", off_v))}
        u, res = step(u, u_old)
        vel = (u[off_u:off_u + ndv], u[off_v:off_v + ndv])
        px, pe, dropped = advect(px, pe, vel, DT)
        if mgr is not None and restore_at is not None and it + 1 == restore_at:
            mgr.save(it + 1, {"u": np.asarray(u), "px": np.asarray(px),
                              "pe": np.asarray(pe)})
    return np.asarray(u), np.asarray(px), np.asarray(pe), float(res)


def main():
    n = int(os.environ.get("EX_N", "8"))
    n_steps = int(os.environ.get("EX_STEPS", "6"))
    n_dev = min(len(jax.devices()), 8)
    ckpt = os.environ.get("EX_OUT", "/tmp/ex10_ckpt")
    ckpt = os.path.join(os.path.dirname(ckpt) or ckpt, "ex10_ckpt")
    import shutil
    shutil.rmtree(ckpt, ignore_errors=True)   # stale runs must not alias
    half = n_steps // 2

    # uninterrupted run, checkpointing at the halfway step
    u_a, px_a, pe_a, res = run(n, n_steps, n_dev, ckpt_dir=ckpt,
                               restore_at=half)

    # fresh run restored from the checkpoint, continuing to the end
    mgr = CheckpointManager(ckpt)
    step_idx = mgr.latest_step()
    assert step_idx == half, (step_idx, half)
    state = mgr.restore(step_idx)
    u_b, px_b, pe_b, _ = run(n, n_steps, n_dev,
                             state0=(step_idx, state["u"], state["px"],
                                     state["pe"]))

    du = np.abs(u_a - u_b).max()
    dx = np.abs(px_a - px_b).max()
    same_elem = (pe_a == pe_b).all()
    alive = int((pe_a >= 0).sum())
    print(f"steps {n_steps} devices {n_dev}: |u|max {np.abs(u_a).max():.4f} "
          f"lin_res {res:.2e}; markers alive {alive}; "
          f"restore drift |du| {du:.2e} |dx| {dx:.2e} elems_match {same_elem}")
    assert du < 1e-12 and dx < 1e-12 and same_elem, "restart must be exact"


if __name__ == "__main__":
    main()
