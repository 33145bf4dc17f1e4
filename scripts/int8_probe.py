"""Probe: does the TPU's int8 MXU path double conv throughput vs bf16?

v5e peak is ~197 TFLOP/s bf16 and ~394 TOP/s int8. Round-1 tracing showed
the interior convs already at ~98% of bf16 peak (docs/PERFORMANCE.md), so
int8 is the only remaining lever for the width-64 flagship. This probe
times representative conv shapes in bf16 vs int8(int32-accum) to decide
whether a quantized serving path is worth building.

Run on the TPU: python scripts/int8_probe.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def conv(x, w, out_dtype):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


INNER = 20  # conv applications per device call — amortizes the ~28 ms
# relay RTT this environment pays per host fetch (docs/PERFORMANCE.md)


def time_fn(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0, 0])  # compile+fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0][0, 0, 0])  # tiny fetch
    return (time.perf_counter() - t0) / (iters * INNER)


def main(batch=128):
    rng = np.random.default_rng(0)
    shapes = [
        ("interior 128x128x128", (batch, 128, 128, 128), 128),
        ("interior 64x64x256", (batch, 64, 64, 256), 256),
        ("fullres 512x512x64", (batch // 2, 512, 512, 64), 64),  # half batch: HBM
        ("bottleneck 32x32x512", (batch, 32, 32, 512), 512),
    ]
    for name, xshape, cout in shapes:
        cin = xshape[-1]
        flops = 2 * 9 * cin * cout * np.prod(xshape[:-1])

        # channel-preserving chains (cin == cout here) let us loop the conv
        # inside one jit via fori_loop, so per-call RTT amortizes away
        x_bf = jnp.asarray(rng.normal(0, 1, xshape), jnp.bfloat16)
        w_bf = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), jnp.bfloat16)

        @jax.jit
        def f_bf(x, w):
            return jax.lax.fori_loop(
                0, INNER,
                lambda i, h: conv(h, w, jnp.bfloat16).astype(jnp.bfloat16), x,
            )

        t_bf = time_fn(f_bf, x_bf, w_bf)

        x_i8 = jnp.asarray(rng.integers(-127, 127, xshape), jnp.int8)
        w_i8 = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)

        @jax.jit
        def f_i8(x, w):
            # int8 in, int32 accum, shift back to int8 (a real quantized layer
            # adds bias + rescale in the same elementwise epilogue cost class)
            return jax.lax.fori_loop(
                0, INNER,
                lambda i, h: (conv(h, w, jnp.int32) >> 7).astype(jnp.int8), x,
            )

        t_i8 = time_fn(f_i8, x_i8, w_i8)

        print(
            f"{name:24s} bf16 {t_bf*1e3:7.2f} ms ({flops/t_bf/1e12:6.1f} TF/s) | "
            f"int8 {t_i8*1e3:7.2f} ms ({flops/t_i8/1e12:6.1f} TOP/s) | "
            f"speedup {t_bf/t_i8:4.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
