"""Micro-probe: which Pallas int8-conv formulation does Mosaic lower well?

Three candidate inner-GEMM formulations for the strip conv kernel
(ops/pallas_qconv.py design doc), measured on one shape — the 512²×64→64
full-res conv that XLA runs at ~22 ms/batch-128 (docs/PERFORMANCE.md int8
trace):

  A: layout (H, Cin, W, N), rhs (3Cin, Wt+2, N) 3-D dot_general per dx
  B: layout (H, Cin, N, W), rhs 2-D (3Cin, N*(Wt+2)) with lane-offset slices
  C: like A but rhs reshaped to 2-D (3Cin, (Wt+2)*N)

Each runs a Hs×Wt strip grid with pl.Element halo windows, requant epilogue.
Prints ms/batch for whichever variants compile; failures print the error
head. Run ONLY when the TPU is free (exclusive access).

Usage: python scripts/pallas_conv_probe.py [H] [N] [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_variant_a(H, W, Cin, Cout, N, Hs, Wt):
    """(H, Cin, W, N); per output row: 3 dx GEMMs, rhs 3-D (3Cin, Wt, N)."""

    def kernel(x_ref, w_ref, o_ref, acc):
        i = pl.program_id(0)
        j = pl.program_id(1)
        x = x_ref[:]  # (Hs+2, Cin, Wt+2, N) — pads hold garbage
        rows = i * Hs - 1 + jax.lax.broadcasted_iota(jnp.int32, (Hs + 2, 1, 1, 1), 0)
        cols = j * Wt - 1 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, Wt + 2, 1), 2)
        ok = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
        x = jnp.where(ok, x, 0)
        for r in range(Hs):
            k3 = x[r : r + 3].reshape(3 * Cin, Wt + 2, N)
            acc[:] = jnp.zeros_like(acc)
            for dx in range(3):
                acc[:] += jax.lax.dot_general(
                    w_ref[dx], k3[:, dx : dx + Wt, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            y = jnp.maximum(acc[:].astype(jnp.float32) * 0.001, 0.0)
            o_ref[r] = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)

    E = pl.Element

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(H // Hs, W // Wt),
            in_specs=[
                pl.BlockSpec(
                    (E(Hs + 2, (1, 1)), E(Cin), E(Wt + 2, (1, 1)), E(N)),
                    lambda i, j: (i * Hs, 0, j * Wt, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((3, Cout, 3 * Cin), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Hs, Cout, Wt, N), lambda i, j: (i, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, Cout, W, N), jnp.int8),
            scratch_shapes=[pltpu.VMEM((Cout, Wt, N), jnp.int32)],
        )(x, w)

    return run, (H, Cin, W, N), (3, Cout, 3 * Cin)


def make_variant_b(H, W, Cin, Cout, N, Hs, Wt):
    """(H, Cin, N, W); rhs 2-D (3Cin, N*(Wt+2)); dx via lane-offset slices."""

    def kernel(x_ref, w_ref, o_ref, acc):
        i = pl.program_id(0)
        j = pl.program_id(1)
        x = x_ref[:]  # (Hs+2, Cin, N, Wt+2)
        rows = i * Hs - 1 + jax.lax.broadcasted_iota(jnp.int32, (Hs + 2, 1, 1, 1), 0)
        cols = j * Wt - 1 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Wt + 2), 3)
        ok = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
        x = jnp.where(ok, x, 0)
        for r in range(Hs):
            k3 = x[r : r + 3].reshape(3 * Cin, N, Wt + 2)
            acc[:] = jnp.zeros_like(acc)
            for dx in range(3):
                rhs = k3[:, :, dx : dx + Wt].reshape(3 * Cin, N * Wt)
                acc[:] += jax.lax.dot_general(
                    w_ref[dx], rhs,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).reshape(Cout, N, Wt)
            y = jnp.maximum(acc[:].astype(jnp.float32) * 0.001, 0.0)
            o_ref[r] = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)

    E = pl.Element

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(H // Hs, W // Wt),
            in_specs=[
                pl.BlockSpec(
                    (E(Hs + 2, (1, 1)), E(Cin), E(N), E(Wt + 2, (1, 1))),
                    lambda i, j: (i * Hs, 0, 0, j * Wt),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((3, Cout, 3 * Cin), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Hs, Cout, N, Wt), lambda i, j: (i, 0, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, Cout, N, W), jnp.int8),
            scratch_shapes=[pltpu.VMEM((Cout, N, Wt), jnp.int32)],
        )(x, w)

    return run, (H, Cin, N, W), (3, Cout, 3 * Cin)


def make_variant_c(H, W, Cin, Cout, N, Hs, Wt):
    """(H, Cin, W, N); rhs reshaped 2-D (3Cin, (Wt)*N) per dx slice."""

    def kernel(x_ref, w_ref, o_ref, acc):
        i = pl.program_id(0)
        j = pl.program_id(1)
        x = x_ref[:]
        rows = i * Hs - 1 + jax.lax.broadcasted_iota(jnp.int32, (Hs + 2, 1, 1, 1), 0)
        cols = j * Wt - 1 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, Wt + 2, 1), 2)
        ok = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
        x = jnp.where(ok, x, 0)
        for r in range(Hs):
            k3 = x[r : r + 3].reshape(3 * Cin, Wt + 2, N)
            acc[:] = jnp.zeros_like(acc)
            for dx in range(3):
                rhs = k3[:, dx : dx + Wt, :].reshape(3 * Cin, Wt * N)
                acc[:] += jax.lax.dot_general(
                    w_ref[dx], rhs,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).reshape(Cout, Wt, N)
            y = jnp.maximum(acc[:].astype(jnp.float32) * 0.001, 0.0)
            o_ref[r] = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)

    E = pl.Element

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(H // Hs, W // Wt),
            in_specs=[
                pl.BlockSpec(
                    (E(Hs + 2, (1, 1)), E(Cin), E(Wt + 2, (1, 1)), E(N)),
                    lambda i, j: (i * Hs, 0, j * Wt, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((3, Cout, 3 * Cin), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Hs, Cout, Wt, N), lambda i, j: (i, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, Cout, W, N), jnp.int8),
            scratch_shapes=[pltpu.VMEM((Cout, Wt, N), jnp.int32)],
        )(x, w)

    return run, (H, Cin, W, N), (3, Cout, 3 * Cin)


def main(H=512, N=128, iters=5):
    W, Cin, Cout, Hs, Wt = H, 64, 64, 2, 128
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-127, 128, (3, Cout, 3 * Cin), dtype=np.int8))

    for name, maker in (("A_3d_rhs", make_variant_a),
                        ("B_lanesW", make_variant_b),
                        ("C_reshape", make_variant_c)):
        try:
            run, xshape, _ = maker(H, W, Cin, Cout, N, Hs, Wt)
            x = jnp.asarray(rng.integers(-127, 128, xshape, dtype=np.int8))
            y = run(x, w)
            np.asarray(y[:1, :1, :1, :1])  # compile+sync
            t0 = time.perf_counter()
            for _ in range(iters):
                y = run(x, w)
                np.asarray(y[:1, :1, :1, :1])
            dt = (time.perf_counter() - t0) / iters
            gflop = 2 * 9 * Cin * Cout * H * W * N / 1e9
            print(f"{name}: {dt*1e3:8.2f} ms  ({gflop/dt/1e3:6.1f} TOP/s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED — {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
