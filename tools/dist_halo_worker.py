"""Worker for the jax.distributed 2-process CPU test (SURVEY.md §4:
multi-node testing without a cluster).  Each process owns 2 virtual CPU
devices; the 4-shard halo-plan SpMV runs over the global mesh (intra-process
collectives over the in-process devices, inter-process over Gloo) and must
match the single-host global SpMV bit-for-bit deterministic setup.

Usage: python dist_halo_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import jax.numpy as jnp
import numpy as np
import jax.experimental.multihost_utils as mhu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from femus_tpu.assembly.bc import generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import poisson
from femus_tpu.mesh.generation import unit_box
from femus_tpu.parallel.halo import build_halo_plan, make_halo_spmv

S = 2 * nproc
mesh_h = unit_box((8, 8), "quad")
asm = Assembler(mesh_h, [Unknown("u", "biquadratic")], quad_order="fifth",
                pad_dofs_to=S, pad_elems_to=S)
asm.set_volume_form(poisson("u", "biquadratic"))
generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
assemble = asm.make_assemble_fn()
u0 = jnp.zeros(asm.n_dofs_pad)
_, data_full = assemble(u0)
data_np = np.asarray(data_full)

rng = np.random.default_rng(7)
x_np = rng.standard_normal(asm.n_dofs_pad)
A = asm.op_with(jnp.asarray(data_np))
y_ref = np.asarray(A @ jnp.asarray(x_np))          # global reference

devs = jax.devices()
assert len(devs) == S, devs
gmesh = Mesh(np.array(devs), ("mesh",))
plan = build_halo_plan(asm.pattern, S)
spmv, _ = make_halo_spmv(plan, gmesh, "mesh")

R = asm.n_dofs_pad // S
lo, hi = pid * 2 * R, (pid + 1) * 2 * R            # this process's 2 shards
xg = mhu.host_local_array_to_global_array(x_np[lo:hi], gmesh, P("mesh"))
dg = mhu.host_local_array_to_global_array(data_np[lo:hi], gmesh,
                                          P("mesh", None))
y = jax.jit(spmv)(dg, xg)
y_local = np.asarray(
    mhu.global_array_to_host_local_array(y, gmesh, P("mesh")))
err = np.abs(y_local - y_ref[lo:hi]).max()
print(f"proc {pid} halo-vs-global max err {err:.3e}", flush=True)
assert err < 1e-12, err
print(f"proc {pid} OK", flush=True)
