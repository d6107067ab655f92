"""Raw slab-streaming microbenchmark: BlockSpec auto-pipeline vs manual
double-buffered DMA (pallas guide pattern) vs single bulk copy.
Measures achieved HBM read bandwidth for the BELL slab shapes.

    python tools/exp_dma.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=500, reps=5):
    # the carry must flow through the kernel or lax.scan hoists the whole
    # (loop-invariant) pallas_call out of the loop
    def sweep(n, *a):
        def body(c, _):
            return fn(*a, c), None
        out, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), None,
                              length=n)
        return out[:1]

    f10 = jax.jit(lambda *a: sweep(10, *a))
    fN = jax.jit(lambda *a: sweep(10 + iters, *a))
    np.asarray(f10(*args)); np.asarray(fN(*args))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f10(*args))
        t1 = time.perf_counter(); np.asarray(fN(*args))
        slopes.append(max(((time.perf_counter() - t1) - (t1 - t0)) / iters,
                          1e-9))
    slopes.sort()
    return slopes[len(slopes) // 2]


def auto_reader(sr, T, CH, dtype):
    n_chunks = sr // CH

    def kernel(b_ref, c_ref, o_ref):
        o_ref[...] = jnp.broadcast_to(
            jnp.sum(b_ref[0, 0, :8].astype(jnp.float32))
            + c_ref[0] * 1e-30, (8,))

    def run(blocks, c):
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((CH, T, 128), lambda i: (i, 0, 0)),
                      pl.BlockSpec((8,), lambda i: (0,))],
            out_specs=pl.BlockSpec((8,), lambda i: (0,)),
            out_shape=jax.ShapeDtypeStruct((8,), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(blocks, c)

    return run


def manual_reader(sr, T, CH, dtype, n_buffers=2):
    n_chunks = sr // CH

    def kernel(b_hbm, c_ref, o_ref):
        def body(scratch, sem):
            def get_dma(slot, ci):
                return pltpu.make_async_copy(
                    b_hbm.at[pl.ds(ci * CH, CH)], scratch.at[slot],
                    sem.at[slot])

            get_dma(0, 0).start()

            def loop(ci, acc):
                cur = jax.lax.rem(ci, n_buffers)
                nxt = jax.lax.rem(ci + 1, n_buffers)

                @pl.when(ci + 1 < n_chunks)
                def _():
                    get_dma(nxt, ci + 1).start()

                get_dma(cur, ci).wait()
                return acc + jnp.sum(
                    scratch[cur, 0, 0, :8].astype(jnp.float32))

            acc = jax.lax.fori_loop(0, n_chunks, loop,
                                    c_ref[0] * 1e-30)
            for k in range(8):
                o_ref[k] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((n_buffers, CH, T, 128), dtype),
            sem=pltpu.SemaphoreType.DMA((n_buffers,)))

    def run(blocks, c):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((8,), jnp.float32),
        )(blocks, c)

    return run


def main():
    sr, T = 2560, 16                       # the L2 nsbenc slab shape
    for dtype, label in ((jnp.float32, "f32 "), (jnp.bfloat16, "bf16")):
        blocks = jnp.asarray(
            np.random.default_rng(0).normal(size=(sr, T, 128)), dtype)
        nbytes = sr * T * 128 * blocks.dtype.itemsize
        for CH in (256, 512):
            t = timed(auto_reader(sr, T, CH, dtype), blocks)
            print(f"{label} CH={CH} auto  : {t*1e6:6.1f} us "
                  f"{nbytes/t/1e9:6.0f} GB/s", flush=True)
            for nb in (2, 3):
                t = timed(manual_reader(sr, T, CH, dtype, nb), blocks)
                print(f"{label} CH={CH} man x{nb}: {t*1e6:6.1f} us "
                      f"{nbytes/t/1e9:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
