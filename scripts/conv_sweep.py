"""Per-layer conv timing with scalar-fetch sync (reliable on the remote TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from twinvoice_tpu.ops.conv import conv2d

B = 32
rng = np.random.default_rng(0)


def timed(fn, x, iters=6):
    f = jax.jit(lambda xx: jnp.sum(fn(xx).astype(jnp.float32)))
    float(np.asarray(f(x)))  # compile
    float(np.asarray(f(x)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(f(x)))  # scalar fetch forces completion
    return (time.perf_counter() - t0) / iters


def conv_case(res, cin, cout, dtype=jnp.bfloat16):
    x = jnp.asarray(rng.standard_normal((B, res, res, cin)), dtype)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dtype)
    b = jnp.zeros((cout,), dtype)
    t = timed(lambda xx: conv2d(xx, k, b, padding=((1, 1), (1, 1))), x)
    fl = 2 * B * res * res * cin * cout * 9
    print(f"conv {res:3d}^2 {cin:4d}->{cout:4d}: {t*1e3:7.2f} ms {fl/t/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    for case in [(512, 3, 64), (512, 64, 64), (256, 128, 128), (128, 256, 256),
                 (64, 512, 512), (32, 1024, 1024), (512, 128, 64), (256, 64, 128)]:
        conv_case(*case)
    print("DONE", flush=True)
