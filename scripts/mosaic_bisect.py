"""Bisect the libtpu compile-helper crash on the NHWC mega-kernels.

The v1/v2 kernels in ops/nhwc_conv.py lower to Mosaic MLIR fine but the
chipless AOT compile subprocess exits 1 with no message. Each probe here
compiles (never executes) a stripped variant to find the offending
feature. Usage: python scripts/mosaic_bisect.py [probe ...]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, CO, TH = 8, 64, 512, 64, 64, 8
NBLK = H // TH


def compile_only(name, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{name}: COMPILE OK", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL — {msg}", flush=True)
        return False


# ---- P1: BlockSpec-fed input/output, inner fori_loop over row blocks,
# rank-3 tap dots. No manual DMA at all.
def p1():
    def kernel(x_ref, w_ref, o_ref):
        def body(blk, carry):
            xw = x_ref[pl.ds(blk * TH, TH + 2)]
            acc = jnp.zeros((TH, W, CO), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + lax.dot_general(
                        xw[dy : dy + TH, dx : dx + W, :], w_ref[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            o_ref[pl.ds(blk * TH, TH)] = jnp.clip(acc, -127, 127).astype(jnp.int8)
            return carry
        lax.fori_loop(0, NBLK, body, 0)

    # block shapes carry a leading 1 — index it away inside the kernel
    def kernel2(x_ref, w_ref, o_ref):
        def body(blk, carry):
            xw = x_ref[0, pl.ds(blk * TH, TH + 2)]
            acc = jnp.zeros((TH, W, CO), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + lax.dot_general(
                        xw[dy : dy + TH, dx : dx + W, :], w_ref[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            o_ref[0, pl.ds(blk * TH, TH)] = jnp.clip(acc, -127, 127).astype(jnp.int8)
            return carry
        lax.fori_loop(0, NBLK, body, 0)

    x = jnp.zeros((B, H + 2, W + 2, C), jnp.int8)
    w = jnp.zeros((3, 3, C, CO), jnp.int8)
    f = pl.pallas_call(
        kernel2, grid=(B,),
        in_specs=[pl.BlockSpec((1, H + 2, W + 2, C), lambda b: (b, 0, 0, 0)),
                  pl.BlockSpec((3, 3, C, CO), lambda b: (0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, W, CO), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, CO), jnp.int8),
        interpret=False)
    return compile_only("P1 blockspec+foriloop+rank3dot", f, x, w)


# ---- P2: manual input DMA ring (ANY->VMEM scratch), BlockSpec output.
def p2():
    def kernel(x_hbm, w_ref, o_ref, xbuf, in_sem):
        b = pl.program_id(0)

        def in_dma(blk, slot):
            return pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(blk * TH, TH + 2)], xbuf.at[slot],
                in_sem.at[slot])

        in_dma(0, 0).start()

        def body(blk, carry):
            slot = blk % 2

            @pl.when(blk + 1 < NBLK)
            def _():
                in_dma(blk + 1, (blk + 1) % 2).start()

            in_dma(blk, slot).wait()
            xw = xbuf[slot]
            acc = jnp.zeros((TH, W, CO), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + lax.dot_general(
                        xw[dy : dy + TH, dx : dx + W, :], w_ref[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            o_ref[0, pl.ds(blk * TH, TH)] = jnp.clip(acc, -127, 127).astype(jnp.int8)
            return carry

        lax.fori_loop(0, NBLK, body, 0)

    x = jnp.zeros((B, H + 2, W + 2, C), jnp.int8)
    w = jnp.zeros((3, 3, C, CO), jnp.int8)
    f = pl.pallas_call(
        kernel, grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((3, 3, C, CO), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, CO), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, CO), jnp.int8),
        scratch_shapes=[pltpu.VMEM((2, TH + 2, W + 2, C), jnp.int8),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=False)
    return compile_only("P2 manual-in-DMA ring", f, x, w)


# ---- P3: P2 + manual OUTPUT DMA ring (the full v1 structure, no requant).
def p3():
    def kernel(x_hbm, w_ref, o_hbm, xbuf, obuf, in_sem, out_sem):
        b = pl.program_id(0)

        def in_dma(blk, slot):
            return pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(blk * TH, TH + 2)], xbuf.at[slot],
                in_sem.at[slot])

        def out_dma(blk, slot):
            return pltpu.make_async_copy(
                obuf.at[slot], o_hbm.at[b, pl.ds(blk * TH, TH)],
                out_sem.at[slot])

        in_dma(0, 0).start()

        def body(blk, carry):
            slot = blk % 2

            @pl.when(blk + 1 < NBLK)
            def _():
                in_dma(blk + 1, (blk + 1) % 2).start()

            in_dma(blk, slot).wait()
            xw = xbuf[slot]
            acc = jnp.zeros((TH, W, CO), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + lax.dot_general(
                        xw[dy : dy + TH, dx : dx + W, :], w_ref[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)

            @pl.when(blk >= 2)
            def _():
                out_dma(blk - 2, slot).wait()

            obuf[slot] = jnp.clip(acc, -127, 127).astype(jnp.int8)
            out_dma(blk, slot).start()
            return carry

        lax.fori_loop(0, NBLK, body, 0)

        @pl.when(NBLK >= 2)
        def _():
            out_dma(NBLK - 2, (NBLK - 2) % 2).wait()

        out_dma(NBLK - 1, (NBLK - 1) % 2).wait()

    x = jnp.zeros((B, H + 2, W + 2, C), jnp.int8)
    w = jnp.zeros((3, 3, C, CO), jnp.int8)
    f = pl.pallas_call(
        kernel, grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((3, 3, C, CO), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H, W, CO), jnp.int8),
        scratch_shapes=[pltpu.VMEM((2, TH + 2, W + 2, C), jnp.int8),
                        pltpu.VMEM((2, TH, W, CO), jnp.int8),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=False)
    return compile_only("P3 manual in+out DMA rings", f, x, w)


# ---- P4: rank-3 dot alone, single grid step, no loops/DMA.
def p4():
    def kernel(x_ref, w_ref, o_ref):
        o_ref[...] = lax.dot_general(
            x_ref[...], w_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    x = jnp.zeros((TH, W, C), jnp.int8)
    w = jnp.zeros((C, CO), jnp.int8)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((TH, W, CO), jnp.int32),
        interpret=False)
    return compile_only("P4 bare rank3 int8 dot", f, x, w)


# ---- P5: the f32 requant epilogue added to P1's math (no DMA).
def p5():
    def kernel(x_ref, w_ref, a_ref, o_ref):
        def body(blk, carry):
            xw = x_ref[0, pl.ds(blk * TH, TH + 2)]
            acc = jnp.zeros((TH, W, CO), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + lax.dot_general(
                        xw[dy : dy + TH, dx : dx + W, :], w_ref[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * a_ref[:]
            q = jnp.clip(jnp.round(jnp.maximum(y, 0.0) * 1.41),
                         0, 127).astype(jnp.int8)
            o_ref[0, pl.ds(blk * TH, TH)] = q
            return carry
        lax.fori_loop(0, NBLK, body, 0)

    x = jnp.zeros((B, H + 2, W + 2, C), jnp.int8)
    w = jnp.zeros((3, 3, C, CO), jnp.int8)
    a = jnp.ones((CO,), jnp.float32)
    f = pl.pallas_call(
        kernel, grid=(B,),
        in_specs=[pl.BlockSpec((1, H + 2, W + 2, C), lambda b: (b, 0, 0, 0)),
                  pl.BlockSpec((3, 3, C, CO), lambda b: (0, 0, 0, 0)),
                  pl.BlockSpec((CO,), lambda b: (0,))],
        out_specs=pl.BlockSpec((1, H, W, CO), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, CO), jnp.int8),
        interpret=False)
    return compile_only("P5 P1+requant epilogue", f, x, w, a)




# ---- P6: manual DMA, start+wait in the SAME fori_loop iteration
# (serial, no cross-iteration prefetch), dynamic slot + offset kept.
def p6():
    def kernel(x_hbm, w_ref, o_ref, xbuf, in_sem):
        b = pl.program_id(0)

        def body(blk, carry):
            slot = blk % 2
            dma = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(blk * TH, TH + 2)], xbuf.at[slot],
                in_sem.at[slot])
            dma.start()
            dma.wait()
            xw = xbuf[slot]
            acc = jnp.zeros((TH, W, CO), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + lax.dot_general(
                        xw[dy : dy + TH, dx : dx + W, :], w_ref[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            o_ref[0, pl.ds(blk * TH, TH)] = jnp.clip(acc, -127, 127).astype(jnp.int8)
            return carry

        lax.fori_loop(0, NBLK, body, 0)

    x = jnp.zeros((B, H + 2, W + 2, C), jnp.int8)
    w = jnp.zeros((3, 3, C, CO), jnp.int8)
    f = pl.pallas_call(
        kernel, grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((3, 3, C, CO), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, CO), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, CO), jnp.int8),
        scratch_shapes=[pltpu.VMEM((2, TH + 2, W + 2, C), jnp.int8),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=False)
    return compile_only("P6 same-iter start+wait DMA", f, x, w)


# ---- P7: cross-iteration ring but with a SINGLE semaphore (no .at[slot])
# and fixed scratch slot indexing via pl.when pairs.
def p7():
    def kernel(x_hbm, w_ref, o_ref, xbuf, in_sem):
        b = pl.program_id(0)

        def in_dma(blk, slot):
            return pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(blk * TH, TH + 2)], xbuf.at[slot],
                in_sem)

        in_dma(0, 0).start()

        def body(blk, carry):
            slot = blk % 2
            in_dma(blk, slot).wait()
            xw = xbuf[slot]
            acc = jnp.zeros((TH, W, CO), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    acc = acc + lax.dot_general(
                        xw[dy : dy + TH, dx : dx + W, :], w_ref[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            o_ref[0, pl.ds(blk * TH, TH)] = jnp.clip(acc, -127, 127).astype(jnp.int8)

            @pl.when(blk + 1 < NBLK)
            def _():
                in_dma(blk + 1, (blk + 1) % 2).start()

            return carry

        lax.fori_loop(0, NBLK, body, 0)

    x = jnp.zeros((B, H + 2, W + 2, C), jnp.int8)
    w = jnp.zeros((3, 3, C, CO), jnp.int8)
    f = pl.pallas_call(
        kernel, grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((3, 3, C, CO), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, CO), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, CO), jnp.int8),
        scratch_shapes=[pltpu.VMEM((2, TH + 2, W + 2, C), jnp.int8),
                        pltpu.SemaphoreType.DMA],
        interpret=False)
    return compile_only("P7 ring w/ single semaphore", f, x, w)

PROBES = {"p1": p1, "p2": p2, "p3": p3, "p4": p4, "p5": p5, "p6": p6, "p7": p7}

if __name__ == "__main__":
    names = [a for a in sys.argv[1:] if a in PROBES] or list(PROBES)
    for n in names:
        PROBES[n]()