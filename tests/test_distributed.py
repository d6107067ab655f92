"""Multi-process distribution (SURVEY.md §4 / §2.4 multi-host row).

- jax.distributed 2-process CPU run (the no-cluster distributed backend):
  the halo-plan SpMV over a 4-shard global mesh spanning two OS processes
  matches the single-host global SpMV;
- communication structure: the halo-routed sharded step lowers to
  all-to-all ghost exchanges rather than full-vector all-gathers inside
  the Krylov loop.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_jax_distributed_two_process_halo_spmv():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "tools", "dist_halo_worker.py"),
         str(pid), "2", "29871"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        cwd=ROOT) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out, out


def test_halo_step_avoids_krylov_allgather():
    """The halo-routed sharded step's HLO moves ghosts with the explicit
    static schedule — collective-permute (banded offset transport, the r5
    default) or all-to-all (dense fallback); the XLA-partitioned fallback
    needs full all-gathers for the x[cols] gather.  Compare collective
    counts between the two lowerings."""
    from femus_tpu.assembly.bc import apply_dirichlet_values, generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.mesh.generation import unit_box
    from femus_tpu.parallel.spmd import device_mesh, make_sharded_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = device_mesh(8)
    m = unit_box((8, 8), "quad")
    asm = Assembler(m, [Unknown("u", "biquadratic")], quad_order="fifth",
                    pad_dofs_to=8, pad_elems_to=8)
    asm.set_volume_form(poisson("u", "biquadratic",
                                rhs=lambda x: 1.0 + 0.0 * x[:, 0]))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    u0 = jnp.asarray(apply_dirichlet_values(asm, np.zeros(asm.n_dofs_pad)))
    u0 = jax.device_put(u0, NamedSharding(mesh, P("mesh")))

    texts = {}
    sols = {}
    for halo in (True, False):
        step = make_sharded_step(asm, mesh, outer="cg", rtol=1e-10,
                                 max_outer=40, use_halo=halo)
        lowered = step.lower(u0)
        texts[halo] = lowered.compile().as_text()
        u1, res = step(u0)
        sols[halo] = np.asarray(u1)
        assert float(res) < 1e-7
    # identical solutions through both communication paths
    assert np.allclose(sols[True], sols[False], atol=1e-9)
    n_explicit = (texts[True].count("all-to-all")
                  + texts[True].count("collective-permute"))
    n_ag_halo = texts[True].count("all-gather(")
    n_ag_xla = texts[False].count("all-gather(")
    assert n_explicit >= 1, "halo path lost its explicit ghost collective"
    assert n_ag_halo < n_ag_xla, (n_ag_halo, n_ag_xla)

    # blocked-ELL local layout (the TPU fast path): same solution again
    step_b = make_sharded_step(asm, mesh, outer="cg", rtol=1e-10,
                               max_outer=40, use_halo=True,
                               local_format="bell")
    u1b, resb = step_b(u0)
    assert float(resb) < 1e-7
    assert np.allclose(np.asarray(u1b), sols[True], atol=1e-9)
