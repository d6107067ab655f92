"""BELL phase isolation, attempt 2 (clean ablations):
A full kernel | B no-VPU (rowsum via tiny MXU dot) | C no-routing (xg via
cheap concat of x slices) | D neither (pure slab-DMA floor).

    python tools/exp_bell3.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import femus_tpu.algebra.bell as bell
from femus_tpu.algebra.bell import build_bell_plan, relayout_ell
from tools.exp_bell import make_asm, BW
from tools.exp_bell2 import timed


def make_variant(p, slab_dtype, routing, use_vpu, use_routing,
                 semantics=("arbitrary",)):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype_x = jnp.float32
    C, pack, T = p.col_block, p.pack, p.tile
    W, WT, CH = p.win, p.twin, p.chunk
    sr = p.slab_rows
    n_chunks = sr // CH
    nxb_pad = max(p.n_xblocks, W, CH + 8)

    def kernel(starts_ref, tstarts_ref, bids_ref, tids_ref, x_ref,
               blocks_ref, yt_ref):
        g = pl.program_id(0)
        s = starts_ref[g]
        t0 = tstarts_ref[g]
        lid = bids_ref[:] - s
        xw = x_ref[pl.ds(s, W), :]
        if use_routing:
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
        else:
            xs = x_ref[pl.ds(0, CH), :]                       # (CH, C)
            xg = jnp.concatenate([xs] * pack, axis=1)         # (CH, 128)
        if use_vpu:
            prod = blocks_ref[:].astype(dtype_x) * xg[:, None, :]
            rowsum = prod.sum(axis=-1)
        else:
            # consume the slab through a cheap MXU dot so the DMA still
            # happens but the Hadamard+lane-reduce VPU phase is absent
            ones = jnp.full((128, T), 1e-3, dtype_x)
            rowsum = (jax.lax.dot(xg, ones,
                                  preferred_element_type=dtype_x)
                      + jax.lax.dot(blocks_ref[:, 0, :].astype(dtype_x),
                                    ones, preferred_element_type=dtype_x))
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
    plan = build_bell_plan(pat, tile=16, col_block=32)
    print(f"n_chunks={len(plan.win_start)} B/nnz f32="
          f"{plan.slab_bytes(4)/nnz:.1f}", flush=True)
    for dt, label, routing in ((None, "f32 ", "split3"),
                               (jnp.bfloat16, "bf16", "default")):
        B = relayout_ell(plan, data, dtype=dt)
        isz = 2 if dt is not None else 4
        bound = nnz / (plan.slab_bytes(isz) / BW) / 1e9
        x0 = B.to_frame(jnp.asarray(xh, jnp.float32))
        for (uv, ur, tag) in ((True, True, "A full     "),
                              (False, True, "B no-vpu   "),
                              (True, False, "C no-route "),
                              (False, False, "D dma-floor")):
            fn = make_variant(B.dev, dt, routing, uv, ur)
            try:
                t = timed(fn, x0, B)
                print(f"{label} {tag}: {t*1e6:6.1f} us "
                      f"({nnz/t/1e9:6.2f} Gnnz/s, bound {bound:.1f})",
                      flush=True)
            except Exception as e:
                print(f"{label} {tag}: FAIL {e!r}"[:160], flush=True)


if __name__ == "__main__":
    main()
