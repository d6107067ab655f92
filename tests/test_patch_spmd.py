"""Sharded patch-stencil SpMV on the virtual 8-device mesh
(parallel/patch_spmd.py): interior compute per patch shard, skeleton closed
by one psum — matches the unsharded PatchStencilOp exactly."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from femus_tpu.assembly.bc import generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import poisson
from femus_tpu.mesh.gambit import read_neu
from femus_tpu.mesh.patches import refine_patched
from femus_tpu.parallel.patch_spmd import (join_vector,
                                           make_sharded_patch_matvec,
                                           shard_patch_op, split_vector)

NSBENC = "/root/reference/unittests/testNSSteadyDD/input/nsbenc.neu"


def test_sharded_patch_matvec_matches():
    coarse = read_neu(NSBENC)
    fine, plan = refine_patched(coarse, 2)
    asm = Assembler(fine, [Unknown("u", "biquadratic")], quad_order="fifth")
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    asm.set_patch_layout(plan)
    R, data = asm.make_assemble_fn()(jnp.zeros(asm.n_dofs_pad))
    A = asm.op_with(data)

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("mesh",))
    parts = shard_patch_op(A, mesh)
    mv = jax.jit(make_sharded_patch_matvec(A.meta, mesh))

    rng = np.random.default_rng(3)
    for _ in range(2):
        x = jnp.asarray(rng.standard_normal(A.n_rows))
        xi, xe, xv = split_vector(A.meta, x)
        y_int, y_e, y_v = mv(parts["wt"], parts["G_face"], parts["G_edge"],
                             parts["M_cs"], parts["M_vs"], xi, xe, xv)
        y = join_vector(A.meta, y_int, y_e, y_v)
        ref = A @ x
        assert np.allclose(np.asarray(y), np.asarray(ref), atol=1e-10), \
            np.abs(np.asarray(y) - np.asarray(ref)).max()
