"""Multi-device tests on the virtual 8-device CPU mesh: halo-exchange SpMV,
sharded solve step, driver dryrun."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from femus_tpu.assembly.bc import apply_dirichlet_values, generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import poisson
from femus_tpu.mesh.generation import unit_box
from femus_tpu.parallel.halo import build_halo_plan, make_halo_spmv
from femus_tpu.parallel.spmd import device_mesh

NDEV = len(jax.devices())


@pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")
def test_halo_spmv_matches_global():
    n_shards = NDEV
    mesh = unit_box((8, 8), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth",
                    pad_dofs_to=n_shards)
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    R, data = jax.jit(asm.make_assemble_fn())(jnp.zeros(asm.n_dofs_pad))
    A = asm.op_with(data)
    x = jnp.asarray(np.random.default_rng(0).normal(size=asm.n_dofs_pad))
    want = np.asarray(A @ x)

    dm = device_mesh(n_shards)
    plan = build_halo_plan(asm.pattern, n_shards)
    spmv, sharding = make_halo_spmv(plan, dm)
    xd = jax.device_put(x, sharding)
    dd = jax.device_put(data, jax.sharding.NamedSharding(
        dm, jax.sharding.PartitionSpec("mesh", None)))
    got = np.asarray(jax.jit(spmv)(dd, xd))
    assert np.allclose(got, want, atol=1e-10)


@pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")
def test_halo_spmv_bell_matches_global():
    """Per-shard blocked-ELL local matvec (halo.make_halo_spmv_bell) —
    the TPU fast path of the distributed SpMV — matches the global op."""
    from femus_tpu.parallel.halo import make_halo_spmv_bell
    n_shards = NDEV
    mesh = unit_box((8, 8), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth",
                    pad_dofs_to=n_shards)
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    R, data = jax.jit(asm.make_assemble_fn())(jnp.zeros(asm.n_dofs_pad))
    A = asm.op_with(data)
    x = jnp.asarray(np.random.default_rng(0).normal(size=asm.n_dofs_pad))
    want = np.asarray(A @ x)

    dm = device_mesh(n_shards)
    plan = build_halo_plan(asm.pattern, n_shards)
    prepare, spmv = make_halo_spmv_bell(plan, asm.pattern, dm)
    xd = jax.device_put(x, jax.sharding.NamedSharding(
        dm, jax.sharding.PartitionSpec("mesh")))
    dd = jax.device_put(data, jax.sharding.NamedSharding(
        dm, jax.sharding.PartitionSpec("mesh", None)))

    @jax.jit
    def run(dd, xd):
        return spmv(prepare(dd), xd)

    got = np.asarray(run(dd, xd))
    assert np.allclose(got, want, atol=1e-10)


@pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")
@pytest.mark.parametrize("transport", ["ppermute", "all_to_all"])
@pytest.mark.parametrize("overlap", [False, True])
def test_halo_spmv_variants_match(transport, overlap):
    """Every transport (offset-ppermute / dense all_to_all) x scheduling
    (sequential / double-buffered interior-boundary overlap) combination of
    the halo SpMV computes the same product as the global operator."""
    n_shards = NDEV
    mesh = unit_box((8, 8), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth",
                    pad_dofs_to=n_shards)
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    R, data = jax.jit(asm.make_assemble_fn())(jnp.zeros(asm.n_dofs_pad))
    A = asm.op_with(data)
    x = jnp.asarray(np.random.default_rng(1).normal(size=asm.n_dofs_pad))
    want = np.asarray(A @ x)

    dm = device_mesh(n_shards)
    plan = build_halo_plan(asm.pattern, n_shards)
    spmv, sharding = make_halo_spmv(plan, dm, overlap=overlap,
                                    transport=transport)
    xd = jax.device_put(x, sharding)
    dd = jax.device_put(data, jax.sharding.NamedSharding(
        dm, jax.sharding.PartitionSpec("mesh", None)))
    got = np.asarray(jax.jit(spmv)(dd, xd))
    assert np.allclose(got, want, atol=1e-10)


@pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")
@pytest.mark.parametrize("overlap", [False, True])
def test_halo_spmv_bell_variants_match(overlap):
    """The split interior/boundary BELL halo matvec equals the global op in
    both the sequential and the overlapped schedule."""
    from femus_tpu.parallel.halo import make_halo_spmv_bell
    n_shards = NDEV
    mesh = unit_box((8, 8), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth",
                    pad_dofs_to=n_shards)
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    R, data = jax.jit(asm.make_assemble_fn())(jnp.zeros(asm.n_dofs_pad))
    A = asm.op_with(data)
    x = jnp.asarray(np.random.default_rng(2).normal(size=asm.n_dofs_pad))
    want = np.asarray(A @ x)

    dm = device_mesh(n_shards)
    plan = build_halo_plan(asm.pattern, n_shards)
    prepare, spmv = make_halo_spmv_bell(plan, asm.pattern, dm,
                                        overlap=overlap)
    xd = jax.device_put(x, jax.sharding.NamedSharding(
        dm, jax.sharding.PartitionSpec("mesh")))
    dd = jax.device_put(data, jax.sharding.NamedSharding(
        dm, jax.sharding.PartitionSpec("mesh", None)))
    got = np.asarray(jax.jit(lambda d, v: spmv(prepare(d), v))(dd, xd))
    assert np.allclose(got, want, atol=1e-10)


@pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")
def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(NDEV)


@pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")
def test_graft_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
