"""Benchmark: SpMV throughput (nnz/s/chip) vs HBM roofline.

Operational metric from BASELINE.md: SpMV >= 70% of per-chip HBM roofline.
The operator is the assembled Q2 Poisson stiffness matrix on a large 2-D quad
mesh.  Device format: DIA (gather-free diagonal layout, algebra/dia.py) when
the dof numbering is lattice-structured, else padded ELL.  The roofline is
defined as BW / 8 B per nnz (value + column index, the general-format
traffic); the DIA path reads only 4 B/nnz, so it can exceed 1.0 of that
roofline by design.

Timing runs inside one jitted scan (per-dispatch latency through the axon
tunnel is ~20 ms and would swamp the kernel).  Operators are passed as pytree
arguments — closing over them would bake 100 MB constants into the HLO and
blow up TPU compile time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

HBM_BW = {  # bytes/s per chip (public specs)
    "v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9, "v4": 1228e9,
    "v6e": 1640e9, "cpu": 50e9,
}


def chip_bw():
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for k, v in HBM_BW.items():
        if k in kind:
            return v
    return 819e9


def build_operator(n):
    """Assembled Q2 Poisson operator on an n x n quad mesh; returns
    (ell_op, dia_op_or_None, stencil_op_or_None, nnz)."""
    from femus_tpu.assembly.bc import generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.algebra.dia import build_dia_plan
    from femus_tpu.algebra.stencil import build_stencil
    from femus_tpu.mesh.generation import unit_box

    mesh = unit_box((n, n), "quad")
    asm = Assembler(mesh, [Unknown("u", "biquadratic")], quad_order="fifth",
                    dtype=jnp.float32)
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
    tables = asm.device_tables()
    u0 = jnp.zeros(asm.n_dofs_pad, jnp.float32)
    R, data = assemble(u0, tables)
    A = asm.op_with(data)
    D = S = None
    plan = build_dia_plan(asm.pattern, max_diags=64)
    if plan is not None:
        D = plan.apply(data, asm.pattern.n_rows)
        S = build_stencil(D, row_width=2 * n + 1)
    return A, D, S, asm.pattern.nnz


def _timed_sweep(op, matvec, iters, repeats=5, x=None):
    @jax.jit
    def sweep(op, x):
        def body(v, _):
            w = matvec(op, v)
            return w / jnp.max(jnp.abs(w)), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y[:1]

    if x is None:
        x = jnp.ones(op.n_rows, jnp.float32)
    np.asarray(sweep(op, x))                  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(sweep(op, x))              # forced fetch = real sync
        times.append(time.perf_counter() - t0)
    return times


LAST_SPREAD = {}


def bench_op(op, matvec, iters=100, name=None, x=None):
    """Per-matvec seconds by the two-length slope method, MEDIAN of >= 5
    repeat slope estimates (the axon tunnel adds multi-ms jitter; a single
    best-of-3 slope can swing +-15%).  The min/median/max slope spread is
    recorded in LAST_SPREAD[name] and surfaced in the bench JSON so a
    regression is distinguishable from tunnel variance.

    block_until_ready does NOT reliably synchronize through the axon
    tunnel (measured: constant ~0.15 ms regardless of scan length), so we
    force a host fetch and difference two scan lengths to cancel the
    ~20 ms dispatch+fetch latency."""
    short = _timed_sweep(op, matvec, 10, x=x)
    long_ = _timed_sweep(op, matvec, 10 + iters, x=x)
    slopes = sorted(max((l - s) / iters, 1e-9)
                    for l, s in zip(long_, short))
    med = slopes[len(slopes) // 2]
    if name is not None:
        LAST_SPREAD[name] = {"min_us": round(slopes[0] * 1e6, 2),
                             "med_us": round(med * 1e6, 2),
                             "max_us": round(slopes[-1] * 1e6, 2)}
    return med


def bench_unstructured_ell():
    """General unstructured ELL SpMV — the path every reference workload
    (nsbenc.neu, fsifirst.neu) actually exercises: the NS Jacobian ELL
    operator assembled on the refined nsbenc channel mesh."""
    from femus_tpu.apps import ns_bench
    levels = int(os.environ.get("BENCH_NS_LEVELS", "2"))
    mesh = ns_bench.load_mesh(levels)
    asm = ns_bench.make_ns_assembler(mesh, dtype=jnp.float32)
    assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
    u0 = jnp.asarray(ns_bench.initial_guess(asm, mesh), jnp.float32)
    _, data = assemble(u0, asm.device_tables())
    A = asm.op_with(data)
    t = bench_op(A, lambda op, v: op @ v, iters=50, name="ell")
    return asm.pattern.nnz / t


def bench_patch_spmv():
    """Patch-lattice stencil SpMV (algebra/patchstencil.py) on the refined
    UNSTRUCTURED nsbenc coarse mesh — the TPU-native operator path for
    refined-hierarchy workloads (scalar biquadratic operator)."""
    from femus_tpu.assembly.bc import generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.mesh.gambit import read_neu
    from femus_tpu.mesh.patches import refine_patched

    levels = int(os.environ.get("BENCH_PATCH_LEVELS", "4"))
    coarse = read_neu(
        "/root/reference/unittests/testNSSteadyDD/input/nsbenc.neu")
    fine, plan = refine_patched(coarse, levels)
    asm = Assembler(fine, [Unknown("u", "biquadratic")], quad_order="fifth",
                    dtype=jnp.float32)
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    asm.set_patch_layout(plan)
    assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
    _, data = assemble(jnp.zeros(asm.n_dofs_pad, jnp.float32),
                       asm.device_tables())
    A = asm.op_with(data)
    t = bench_op(A, lambda op, v: op @ v, iters=300, name="patch")
    return asm.pattern.nnz / t


def bench_patch3d_spmv():
    """3-D hex patch-lattice stencil SpMV (algebra/patchstencil3d.py) on a
    refined unstructured hex box — the 3-D analogue of the patch metric."""
    from femus_tpu.assembly.bc import generate_bdc
    from femus_tpu.assembly.engine import Assembler, Unknown
    from femus_tpu.assembly.forms import poisson
    from femus_tpu.mesh.generation import box
    from femus_tpu.mesh.patches3d import refine_patched_hex

    # default L2: the L3 hex Q2 assembly jacfwd kernel crashes the remote
    # TPU compile helper (HTTP 500) on the current toolchain — the SpMV
    # itself is depth-independent per patch, so L2 measures the same path
    levels = int(os.environ.get("BENCH_PATCH3D_LEVELS", "2"))
    coarse = box((4, 4, 4), [(0, 1), (0, 1), (0, 1)], "hex")
    fine, plan = refine_patched_hex(coarse, levels)
    asm = Assembler(fine, [Unknown("u", "biquadratic")], quad_order="fifth",
                    dtype=jnp.float32)
    asm.set_volume_form(poisson("u", "biquadratic"))
    generate_bdc(asm, lambda var, x, grp, t: (True, 0.0))
    asm.set_patch_layout(plan)
    assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
    _, data = assemble(jnp.zeros(asm.n_dofs_pad, jnp.float32),
                       asm.device_tables())
    A = asm.op_with(data)
    t = bench_op(A, lambda op, v: op @ v, iters=300, name="patch3d")
    return asm.pattern.nnz / t


def bench_bell_unstructured(dtype=None, name="bell"):
    """Blocked-ELL SpMV (algebra/bell.py) on the same unstructured nsbenc NS
    Jacobian the ELL metric uses — the general-unstructured TPU fast path:
    RCM-on-the-stacked-pattern ordering (interleaves the KKoffset variable
    slabs), narrow C=32 packed blocks, fused windowed Pallas kernel,
    measured FRAME-RESIDENT (solvers permute once at the boundaries via
    to_frame/from_frame; a per-matvec permute would cost 2 n-gathers).
    Also records the slab layout stats (bytes/nnz + the slab-traffic
    roofline) so achieved-vs-bound is visible next to the number."""
    from femus_tpu.apps import ns_bench
    from femus_tpu.algebra.bell import build_bell_plan, relayout_ell
    from femus_tpu.mesh.reorder import rcm_reorder
    levels = int(os.environ.get("BENCH_NS_LEVELS", "2"))
    mesh = rcm_reorder(ns_bench.load_mesh(levels))
    # interleave=True: the production BELL config (node-major variable
    # interleaving densifies the slab blocks — measured r5: 35.7 vs 39.2
    # B/nnz f32, and +15% Gnnz/s on the same kernel)
    asm = ns_bench.make_ns_assembler(mesh, dtype=jnp.float32,
                                     interleave=True)
    assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
    u0 = jnp.asarray(ns_bench.initial_guess(asm, mesh), jnp.float32)
    _, data = assemble(u0, asm.device_tables())
    plan = build_bell_plan(asm.pattern)
    B = relayout_ell(plan, data, dtype=dtype)
    nnz = asm.pattern.nnz
    isz = 2 if dtype is not None else 4
    x0 = B.to_frame(jnp.ones(asm.pattern.n_rows, jnp.float32))
    # 1000 iterations: these kernels are ~30-50 us, and the axon tunnel's
    # per-dispatch jitter is ms-scale — the slope needs a long scan to
    # stay out of the noise floor
    t = bench_op(B, lambda op, v: op.matvec_frame(v), iters=1000,
                 name=name, x=x0)
    bound = nnz / (plan.slab_bytes(isz) / chip_bw())
    LAST_SPREAD[name]["slab_bytes_per_nnz"] = round(
        plan.slab_bytes(isz) / nnz, 1)
    LAST_SPREAD[name]["traffic_bound_gnnz_s"] = round(bound / 1e9, 1)
    LAST_SPREAD[name]["pct_of_bound"] = round(100.0 * (nnz / t) / bound, 1)
    return nnz / t


def bench_mg_vcycle():
    """One MG V-cycle application on the nsbenc NS hierarchy (Vanka
    smoothers, dense coarse solve, BELL matvecs) — the BASELINE.md
    "MG V-cycle time" operational metric.  The hierarchy (PtAP + Vanka
    factorizations) is built once per sweep; the scan-slope cancels it."""
    from femus_tpu.apps import ns_bench
    from femus_tpu.algebra.bell import bell_backed
    from femus_tpu.algebra.mg import build_hierarchy
    from femus_tpu.algebra.vanka import build_element_blocks
    levels = int(os.environ.get("BENCH_NS_LEVELS", "2"))
    prob, sys_ = ns_bench.make_ns_system(levels=levels, rtol=1e-4)
    sys_.config.operator = "bell"
    lvl = levels - 1
    a = sys_.assemblers[lvl]
    assemble = jax.jit(a.make_assemble_fn(pass_tables=True))
    u = jnp.asarray(sys_.gather(lvl))
    _, data = assemble(u, a.device_tables_cached(), {}, {})
    transfers = sys_._transfers_for(lvl)
    cfg = sys_.config
    vblocks = []
    for j in range(lvl + 1):
        pat = transfers[j][2].coarse_pattern if j < len(transfers) else None
        vblocks.append(build_element_blocks(
            sys_.assemblers[j], cfg.vanka_block_elems, pattern=pat,
            groups=cfg.vanka_groups))
    bell_f = sys_._bell_dev(a.pattern)
    bell_c = [sys_._bell_dev(t[2].coarse_pattern) for t in transfers]
    dmasks = [jnp.asarray(m) for m in sys_.masks[:lvl]]

    def sweep_fn(iters):
        # transfers / Vanka tables / masks / BELL plans enter as jit
        # ARGUMENTS — closing over them would bake multi-MB index constants
        # into the HLO and stall XLA constant folding (see systems/system.py)
        def sweep(data, r0, transfers_a, dmasks_a, vblocks_a, bf_a, bc_a):
            A = a.op_with(data)
            if bf_a is not None:
                A = bell_backed(bf_a, A)
            h = build_hierarchy(A, transfers_a, smoother=cfg.smoother,
                                n_pre=cfg.n_pre, n_post=cfg.n_post,
                                dir_masks=dmasks_a, vanka_blocks=vblocks_a,
                                vanka_omega=cfg.vanka_omega,
                                bell_plans=list(bc_a) + [None])
            M = h.as_preconditioner("V")

            def body(r, _):
                w = M(r)
                return w / jnp.max(jnp.abs(w)), None
            r, _ = jax.lax.scan(body, r0, None, length=iters)
            return r[:1]
        return jax.jit(sweep)

    r0 = jnp.ones(a.n_dofs_pad, data.dtype)

    def run(it):
        f = sweep_fn(it)
        args = (data, r0, transfers, dmasks, vblocks, bell_f, bell_c)
        np.asarray(f(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    iters = 12
    return max((run(2 + iters) - run(2)) / iters, 1e-9)


def bench_newton_step():
    """One FULL Newton step on the nsbenc NS system through the framework's
    own solver: element-last assembly + Galerkin PtAP chain + V-cycle(Vanka)-
    preconditioned GMRES, with every matvec on the blocked-ELL slab
    (operator="bell" — the hot path of System.solve; 6.3x the pure-ELL
    step on v5e).  Returns (wall seconds, GMRES iterations-to-tolerance)."""
    from femus_tpu.apps import ns_bench
    levels = int(os.environ.get("BENCH_NS_LEVELS", "2"))
    # bench runs float32 (x64 off): 1e-4 relative residual reduction is the
    # realistic single-precision Krylov target; iteration counts stay
    # comparable with the reference's per-step counts.  interleave=True =
    # the production BELL config (RCM meshes + node-major layout -> banded
    # identity plans, no permutes)
    prob, sys_ = ns_bench.make_ns_system(levels=levels, rtol=1e-4,
                                         interleave=True)
    sys_.config.operator = "bell"
    step = sys_.step_fn(-1)
    u = jnp.asarray(sys_.gather(-1))
    tabs = sys_.assemblers[-1].device_tables_cached()
    out = step(u, tabs, {}, {})
    iters = int(np.asarray(out[3]))           # forced fetch = compile + sync
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = step(u, tabs, {}, {})
        np.asarray(out[0])                    # forced fetch = real sync
        best = min(best, time.perf_counter() - t0)
    return best, iters


def main():
    n = int(os.environ.get("BENCH_N", "512"))
    A, D, S, nnz = build_operator(n)
    results = {}
    if S is not None:
        # XLA-fused 2-D static-slice stencil: the fastest measured path
        # (fuses 25 shifted multiply-adds into one HBM pass over the
        # weights; ~75% of absolute HBM roofline)
        t = bench_op(S, lambda op, v: op.matvec(v), iters=400,
                     name="stencil_xla")
        results["stencil_xla"] = nnz / t
        try:
            from femus_tpu.algebra.stencil import spmv_stencil_pallas
            t = bench_op(S, lambda op, v: spmv_stencil_pallas(op, v),
                         iters=400, name="stencil_pallas")
            results["stencil_pallas"] = nnz / t
        except Exception:
            pass
    if D is not None and not results:
        try:
            from femus_tpu.algebra.dia import spmv_dia_pallas
            t = bench_op(D, lambda op, v: spmv_dia_pallas(op, v))
            results["dia_pallas"] = nnz / t
        except Exception:
            pass
    if not results:
        # fallback: general ELL path (jnp-DIA is avoided here: its
        # pad+dynamic_slice HLO compiles pathologically slowly on the
        # remote TPU toolchain)
        t = bench_op(A, lambda op, v: op @ v, iters=20)
        results["ell"] = nnz / t
    best_name = max(results, key=results.get)
    nnz_per_s = results[best_name]
    roofline = chip_bw() / 8.0            # 8 B/nnz value+index traffic
    baseline = 0.7 * roofline

    # operational metrics beyond the single favorable path (BASELINE.md
    # table; VERDICT r1 weak #2): general unstructured ELL on the real
    # nsbenc operator, and a full assemble+MG-GMRES Newton step
    extra = {}
    if os.environ.get("BENCH_SKIP_EXTRA", "0") != "1":
        try:
            extra["ell_unstructured_gnnz_s"] = round(
                bench_unstructured_ell() / 1e9, 3)
        except Exception as e:          # never lose the headline metric
            extra["ell_unstructured_error"] = repr(e)[:120]
        try:
            extra["bell_unstructured_gnnz_s"] = round(
                bench_bell_unstructured() / 1e9, 3)
        except Exception as e:
            extra["bell_unstructured_error"] = repr(e)[:120]
        try:
            extra["bell_bf16_gnnz_s"] = round(
                bench_bell_unstructured(jnp.bfloat16, name="bell_bf16")
                / 1e9, 3)
        except Exception as e:
            extra["bell_bf16_error"] = repr(e)[:120]
        try:
            extra["patch_spmv_gnnz_s"] = round(bench_patch_spmv() / 1e9, 3)
        except Exception as e:
            extra["patch_spmv_error"] = repr(e)[:120]
        try:
            extra["patch3d_spmv_gnnz_s"] = round(
                bench_patch3d_spmv() / 1e9, 3)
        except Exception as e:
            extra["patch3d_spmv_error"] = repr(e)[:120]
        try:
            step_s, iters = bench_newton_step()
            extra["ns_newton_step_s"] = round(step_s, 4)
            extra["ns_gmres_iters_to_tol"] = iters
        except Exception as e:
            extra["ns_newton_step_error"] = repr(e)[:120]
        try:
            extra["mg_vcycle_ms"] = round(bench_mg_vcycle() * 1e3, 3)
        except Exception as e:
            extra["mg_vcycle_error"] = repr(e)[:120]

    if LAST_SPREAD:
        extra["spread"] = LAST_SPREAD
    print(json.dumps({
        "metric": "spmv_nnz_per_s_per_chip",
        "value": round(nnz_per_s / 1e9, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(nnz_per_s / baseline, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
