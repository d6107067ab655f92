"""Manually-pipelined BELL kernel experiment: single grid step, fori_loop
over chunks, double-buffered async DMA of slab chunks from HBM, compute
overlapped by construction.  Compares against the auto-BlockSpec kernel.

    python tools/exp_bell4.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import femus_tpu.algebra.bell as bell
from femus_tpu.algebra.bell import build_bell_plan, relayout_ell
from tools.exp_bell import make_asm, BW
from tools.exp_bell2 import timed


def make_manual(p, slab_dtype, routing, n_buffers=2):
    dtype_x = jnp.float32
    C, pack, T = p.col_block, p.pack, p.tile
    W, WT, CH = p.win, p.twin, p.chunk
    sr = p.slab_rows
    n_chunks = sr // CH
    nxb_pad = max(p.n_xblocks, W)

    def kernel(starts_ref, tstarts_ref, bids_ref, tids_ref, x_ref,
               b_hbm, yt_ref):
        def body(scratch, sem):
            def get_dma(slot, ci):
                return pltpu.make_async_copy(
                    b_hbm.at[pl.ds(ci * CH, CH)], scratch.at[slot],
                    sem.at[slot])

            get_dma(0, 0).start()

            def loop(ci, _):
                cur = jax.lax.rem(ci, n_buffers)
                nxt = jax.lax.rem(ci + 1, n_buffers)

                @pl.when(ci + 1 < n_chunks)
                def _():
                    get_dma(nxt, ci + 1).start()

                s = starts_ref[ci]
                t0 = tstarts_ref[ci]
                lid = bids_ref[pl.ds(ci * CH, CH), :] - s     # (CH, pack)
                xw = x_ref[pl.ds(s, W), :]
                iw = jax.lax.broadcasted_iota(jnp.int32, (CH, W), 1)
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

                get_dma(cur, ci).wait()
                prod = scratch[cur].astype(dtype_x) * xg[:, None, :]
                rowsum = prod.sum(axis=-1)
                ltid = tids_ref[pl.ds(ci * CH, CH), 0] - t0
                it = jax.lax.broadcasted_iota(jnp.int32, (CH, WT), 1)
                ttT = (ltid[:, None] == it).astype(dtype_x)
                yt_ref[pl.ds(ci, 1)] = jax.lax.dot_general(
                    ttT, rowsum, (((0,), (0,)), ((), ())),
                    preferred_element_type=dtype_x,
                    precision=jax.lax.Precision.HIGHEST)[None]
                return 0

            jax.lax.fori_loop(0, n_chunks, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((n_buffers, CH, T, 128), slab_dtype),
            sem=pltpu.SemaphoreType.DMA((n_buffers,)))

    def run(op, xf):
        x2d = jnp.zeros(nxb_pad * C, dtype_x).at[:p.n].set(xf).reshape(
            nxb_pad, C)
        yt = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # win_start
                pl.BlockSpec(memory_space=pltpu.SMEM),   # twin_start
                pl.BlockSpec(memory_space=pltpu.VMEM),   # block ids
                pl.BlockSpec(memory_space=pltpu.VMEM),   # tile ids
                pl.BlockSpec(memory_space=pltpu.VMEM),   # x2d
                pl.BlockSpec(memory_space=pltpu.HBM),    # slab
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_chunks, WT, T), dtype_x),
        )(p.win_start, p.twin_start,
          jnp.asarray(np.asarray(p.block_ids).reshape(sr, pack)),
          jnp.asarray(np.asarray(p.tile_ids).reshape(sr, 1)),
          x2d, op.blocks.reshape(sr, T, 128))
        pieces = [yt[c, :w] for c, w in enumerate(p.tile_widths) if w > 0]
        out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 0)
        return out.reshape(-1)[:p.n]

    return run


def main():
    import scipy.sparse as sp
    asm, data = make_asm(True)
    pat = asm.pattern
    nnz = pat.nnz
    rng = np.random.default_rng(0)
    xh = rng.normal(size=pat.n_rows)
    rows = np.repeat(np.arange(pat.n_rows), pat.width)
    valid = np.asarray(pat.valid).ravel()
    vals = np.asarray(data, np.float64).ravel()
    Acsr = sp.csr_matrix(
        (vals[valid], (rows[valid], np.asarray(pat.cols).ravel()[valid])),
        shape=(pat.n_rows, pat.n_cols))
    yref = Acsr @ xh
    ynorm = np.linalg.norm(yref)

    plan = build_bell_plan(pat, tile=16, col_block=32)
    for dt, label, routing in ((jnp.bfloat16, "bf16", "default"),
                               (None, "f32 ", "split3")):
        B = relayout_ell(plan, data, dtype=dt)
        isz = 2 if dt is not None else 4
        bound = nnz / (plan.slab_bytes(isz) / BW) / 1e9
        x0 = B.to_frame(jnp.asarray(xh, jnp.float32))
        for nb in (2, 3):
            fn = make_manual(B.dev, jnp.bfloat16 if dt is not None
                             else jnp.float32, routing, nb)
            try:
                y = np.asarray(B.from_frame(jnp.asarray(fn(B, x0))))
                err = np.linalg.norm(y - yref) / ynorm
                t = timed(fn, x0, B)
                print(f"{label} manual x{nb}: {t*1e6:6.1f} us "
                      f"({nnz/t/1e9:6.2f} Gnnz/s, bound {bound:.1f}) "
                      f"relerr={err:.2e}", flush=True)
            except Exception as e:
                print(f"{label} manual x{nb}: FAIL {e!r}"[:300], flush=True)


if __name__ == "__main__":
    main()
