"""BELL kernel/layout experiment harness (real TPU via the axon tunnel).

Sweeps (interleave, C, T) layouts x (dtype, routing scheme) and reports
Gnnz/s, the layout's slab-traffic bound, achieved fraction, and relative
matvec error vs the f64 CSR reference.

    python tools/exp_bell.py                  # full sweep
    EXP_CONFIGS="i32x8,i16x8" python tools/exp_bell.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import femus_tpu.algebra.bell as bell
from femus_tpu.algebra.bell import build_bell_plan, relayout_ell
from femus_tpu.apps import ns_bench
from femus_tpu.assembly.bc import generate_bdc
from femus_tpu.assembly.engine import Assembler, Unknown
from femus_tpu.assembly.forms import navier_stokes
from femus_tpu.mesh.reorder import rcm_reorder

BW = 8.2e11  # v5e HBM ~820 GB/s


def make_asm(interleave):
    mesh = rcm_reorder(ns_bench.load_mesh(int(os.environ.get(
        "BENCH_NS_LEVELS", "2"))))
    asm = Assembler(mesh, [Unknown("U", "biquadratic"),
                           Unknown("V", "biquadratic"),
                           Unknown("P", "disc_linear")],
                    quad_order="seventh", dtype=jnp.float32,
                    interleave=interleave)
    asm.set_volume_form(navier_stokes(("U", "V"), "P",
                                      pres_family="disc_linear",
                                      nu=ns_bench.IRE))
    generate_bdc(asm, ns_bench.bc_ns)
    assemble = jax.jit(asm.make_assemble_fn(pass_tables=True))
    u0 = jnp.asarray(ns_bench.initial_guess(asm, mesh), jnp.float32)
    _, data = assemble(u0, asm.device_tables())
    return asm, data


def time_frame_mv(B, x0, iters=1000, reps=5):
    def sweep(op, x, n):
        def body(v, _):
            w = bell._spmv_bell_pallas_frame(op, v)
            return w / jnp.max(jnp.abs(w)), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y[:1]

    f10 = jax.jit(lambda op, x: sweep(op, x, 10))
    fN = jax.jit(lambda op, x: sweep(op, x, 10 + iters))
    np.asarray(f10(B, x0)); np.asarray(fN(B, x0))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f10(B, x0))
        t1 = time.perf_counter(); np.asarray(fN(B, x0))
        t2 = time.perf_counter()
        slopes.append(max(((t2 - t1) - (t1 - t0)) / iters, 1e-9))
    slopes.sort()
    return slopes[len(slopes) // 2], slopes


def main():
    import scipy.sparse as sp
    want = os.environ.get("EXP_CONFIGS", "").split(",") if \
        os.environ.get("EXP_CONFIGS") else None
    asms = {}
    rng = np.random.default_rng(0)
    for interleave in (True, False):
        key = "i" if interleave else "s"
        asms[key] = make_asm(interleave)

    for interleave in ("i", "s"):
        asm, data = asms[interleave]
        pat = asm.pattern
        nnz = pat.nnz
        # f64 CSR reference
        rows = np.repeat(np.arange(pat.n_rows), pat.width)
        valid = np.asarray(pat.valid).ravel()
        vals = np.asarray(data, np.float64).ravel()
        Acsr = sp.csr_matrix(
            (vals[valid], (rows[valid], np.asarray(pat.cols).ravel()[valid])),
            shape=(pat.n_rows, pat.n_cols))
        xh = rng.normal(size=pat.n_rows)
        yref = Acsr @ xh
        ynorm = np.linalg.norm(yref)
        for C, T in ((32, 16), (32, 8), (16, 8), (16, 16), (8, 8)):
            name = f"{interleave}{C}x{T}"
            if want and name not in want:
                continue
            plan = build_bell_plan(pat, tile=T, col_block=C)
            if plan.twin > 4096 or plan.win > bell._MAX_WIN:
                print(f"{name}: SKIP win={plan.win} twin={plan.twin}")
                continue
            for dt, routings in ((None, ("split3", "highest")),
                                 (jnp.bfloat16, ("default",))):
                B = relayout_ell(plan, data, dtype=dt)
                isz = 2 if dt is not None else 4
                bound = nnz / (plan.slab_bytes(isz) / BW)
                x0 = B.to_frame(jnp.asarray(xh, jnp.float32))
                for routing in routings:
                    bell._ROUTING_OVERRIDE = routing
                    try:
                        y = np.asarray(bell._spmv_bell_pallas_frame(B, x0))
                        yerr = np.linalg.norm(
                            np.asarray(B.from_frame(jnp.asarray(y)))
                            - yref) / ynorm
                        t, spread = time_frame_mv(B, x0)
                        g = nnz / t / 1e9
                        print(f"{name} {'bf16' if dt else 'f32 '} "
                              f"{routing:8s}: {g:6.2f} Gnnz/s "
                              f"({100*g/(bound/1e9):5.1f}% of {bound/1e9:5.1f}) "
                              f"relerr={yerr:.2e} "
                              f"spread=[{spread[0]*1e6:.1f},{spread[-1]*1e6:.1f}]us",
                              flush=True)
                    except Exception as e:
                        print(f"{name} {dt} {routing}: FAIL {e!r}"[:200],
                              flush=True)
                    finally:
                        bell._ROUTING_OVERRIDE = None


if __name__ == "__main__":
    main()
