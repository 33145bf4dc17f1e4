"""Per-layer conv microbenchmark: what does XLA achieve per U-Net stage?

Times each (resolution, Cin, Cout) conv shape of the U-Net separately and
reports effective TFLOP/s, to locate where the serving path loses MXU
utilization. Run from repo root.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from twinvoice_tpu.ops.conv import conv2d, conv_transpose2x2, max_pool2

B = 32


def timeit(fn, args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # fresh second warmup to be safe
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)  # sync every iter: artifact-proof
    return (time.perf_counter() - t0) / iters


def conv_case(res, cin, cout, dtype=jnp.bfloat16, relu=True):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, res, res, cin)), dtype)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dtype)
    b = jnp.zeros((cout,), dtype)

    @jax.jit
    def f(x, k, b):
        y = conv2d(x, k, b, padding=((1, 1), (1, 1)))
        return jax.nn.relu(y) if relu else y

    t = timeit(f, (x, k, b))
    flops = 2 * B * res * res * cin * cout * 9
    print(f"conv3x3 {res:3d}^2 {cin:4d}->{cout:4d}: {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s")
    return t, flops


def main():
    print("device:", jax.devices()[0])
    total_t, total_f = 0.0, 0.0
    # encoder + decoder double-conv shapes (enc and dec mirror each other)
    cases = [
        (512, 3, 64), (512, 64, 64),
        (256, 64, 128), (256, 128, 128),
        (128, 128, 256), (128, 256, 256),
        (64, 256, 512), (64, 512, 512),
        (32, 512, 1024), (32, 1024, 1024),
        # decoder concat convs
        (64, 1024, 512), (64, 512, 512),
        (128, 512, 256), (128, 256, 256),
        (256, 256, 128), (256, 128, 128),
        (512, 128, 64), (512, 64, 64),
    ]
    for res, cin, cout in cases:
        t, f = conv_case(res, cin, cout)
        total_t += t
        total_f += f
    print(f"sum of conv stages: {total_t*1e3:.1f} ms/batch "
          f"({B/total_t:.0f} img/s if convs alone) avg {total_f/total_t/1e12:.1f} TF/s")

    # the non-conv ops
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 512, 512, 64)), jnp.bfloat16)
    t = timeit(jax.jit(max_pool2), (x,))
    print(f"maxpool 512^2x64: {t*1e3:.2f} ms")
    k = {"kernel": jnp.asarray(rng.standard_normal((2, 2, 1024, 512)) * 0.05, jnp.bfloat16),
         "bias": jnp.zeros((512,), jnp.bfloat16)}
    xb = jnp.asarray(rng.standard_normal((B, 32, 32, 1024)), jnp.bfloat16)
    t = timeit(jax.jit(conv_transpose2x2), (xb, k))
    print(f"convT 32^2 1024->512: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
