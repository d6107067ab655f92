"""BELL kernel ablations on the best layout (interleaved C=32 T=16):
which phase (slab DMA / MXU routing / VPU elementwise) limits the kernel,
and do chunk size / dimension semantics change the overlap?

    python tools/exp_bell2.py
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
from tools.exp_bell import make_asm, BW


def timed(fn, x0, B, iters=1000, reps=5):
    def sweep(op, x, n):
        def body(v, _):
            w = fn(op, v)
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
        slopes.append(max(((time.perf_counter() - t1) - (t1 - t0)) / iters,
                          1e-9))
    slopes.sort()
    return slopes[len(slopes) // 2]


def make_kernel_variant(p, dtype_x, slab_dtype, routing="split3",
                        ablate=None, semantics=("arbitrary",)):
    """Standalone copy of the fused kernel with ablation switches:
    ablate="routing" -> xg replaced by a static slice (no one-hot dots);
    ablate="vpu" -> rowsum replaced by a lane-slice of the raw blocks
    (no elementwise multiply); None -> full kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, pack, T = p.col_block, p.pack, p.tile
    W, WT, CH = p.win, p.twin, p.chunk
    sr = p.slab_rows
    n_chunks = sr // CH
    nxb_pad = max(p.n_xblocks, W)

    def kernel(starts_ref, tstarts_ref, bids_ref, tids_ref, x_ref,
               blocks_ref, yt_ref):
        g = pl.program_id(0)
        s = starts_ref[g]
        t0 = tstarts_ref[g]
        lid = bids_ref[:] - s
        xw = x_ref[pl.ds(s, W), :]
        iw = jax.lax.broadcasted_iota(jnp.int32, (CH, W), 1)
        if ablate == "routing":
            xg = jnp.broadcast_to(xw.reshape(-1)[:128][None, :], (CH, 128))
        else:
            if routing == "split3":
                x1 = xw.astype(jnp.bfloat16)
                r1 = xw - x1.astype(dtype_x)
                x2 = r1.astype(jnp.bfloat16)
                x3 = (r1 - x2.astype(dtype_x)).astype(jnp.bfloat16)
            segs = []
            for q in range(pack):
                if routing == "split3":
                    oh = (lid[:, q:q + 1] == iw).astype(jnp.bfloat16)
                    seg = sum(jnp.dot(oh, xk,
                                      preferred_element_type=dtype_x)
                              for xk in (x1, x2, x3))
                else:
                    oh = (lid[:, q:q + 1] == iw).astype(dtype_x)
                    seg = jnp.dot(oh, xw, preferred_element_type=dtype_x,
                                  precision=jax.lax.Precision.DEFAULT)
                segs.append(seg)
            xg = segs[0] if pack == 1 else jnp.concatenate(segs, axis=1)
        if ablate == "vpu":
            rowsum = blocks_ref[:, :, 0].astype(dtype_x) + xg[:, :T]
        else:
            prod = blocks_ref[:].astype(dtype_x) * xg[:, None, :]
            rowsum = prod.sum(axis=-1)
        ltid = tids_ref[:, 0] - t0
        it = jax.lax.broadcasted_iota(jnp.int32, (CH, WT), 1)
        ttT = (ltid[:, None] == it).astype(dtype_x)
        yt_ref[0] = jax.lax.dot_general(
            ttT, rowsum, (((0,), (0,)), ((), ())),
            preferred_element_type=dtype_x,
            precision=jax.lax.Precision.HIGHEST)

    def run(op, xf):
        x2d = jnp.zeros(nxb_pad * C, dtype_x).at[:p.n].set(xf).reshape(
            nxb_pad, C)
        yt = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec((CH, pack), lambda i, s, t: (i, 0)),
                    pl.BlockSpec((CH, 1), lambda i, s, t: (i, 0)),
                    pl.BlockSpec((nxb_pad, C), lambda i, s, t: (0, 0)),
                    pl.BlockSpec((CH, T, 128), lambda i, s, t: (i, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, WT, T), lambda i, s, t: (i, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((n_chunks, WT, T), dtype_x),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=semantics),
        )(p.win_start, p.twin_start, p.block_ids.reshape(sr, pack),
          p.tile_ids.reshape(sr, 1), x2d, op.blocks)
        pieces = [yt[c, :w] for c, w in enumerate(p.tile_widths) if w > 0]
        out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 0)
        return out.reshape(-1)[:p.n]

    return run


def main():
    asm, data = make_asm(True)
    pat = asm.pattern
    nnz = pat.nnz
    rng = np.random.default_rng(0)
    xh = rng.normal(size=pat.n_rows)
    chunks = [int(c) for c in os.environ.get("EXP_CHUNKS",
                                             "256,512").split(",")]
    for CH in chunks:
        bell._CHUNK = CH
        plan = build_bell_plan(pat, tile=16, col_block=32)
        print(f"-- CH={CH} win={plan.win} twin={plan.twin} "
              f"n_chunks={len(plan.win_start)} "
              f"B/nnz={plan.slab_bytes(4)/nnz:.1f}", flush=True)
        for dt, label, routing in ((None, "f32 ", "split3"),
                                   (jnp.bfloat16, "bf16", "default")):
            B = relayout_ell(plan, data, dtype=dt)
            isz = 2 if dt is not None else 4
            bound = nnz / (plan.slab_bytes(isz) / BW) / 1e9
            x0 = B.to_frame(jnp.asarray(xh, jnp.float32))
            for sem in ("arbitrary", "parallel"):
                for ablate in (None, "routing", "vpu"):
                    fn = make_kernel_variant(B.dev, jnp.float32, dt,
                                             routing=routing, ablate=ablate,
                                             semantics=(sem,))
                    try:
                        t = timed(fn, x0, B)
                        print(f"CH={CH} {label} {sem:9s} "
                              f"ablate={str(ablate):8s}: {t*1e6:6.1f} us "
                              f"({nnz/t/1e9:6.2f} Gnnz/s, bound {bound:.1f})",
                              flush=True)
                    except Exception as e:
                        print(f"CH={CH} {label} {sem} {ablate}: "
                              f"FAIL {e!r}"[:160], flush=True)


if __name__ == "__main__":
    main()
