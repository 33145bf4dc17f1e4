"""Trustworthy op timing under the remote-relay TPU platform.

``block_until_ready`` proved unreliable here (arrays can report ready before
the remote computation finishes), so ops are timed by running ``iters``
data-dependent repetitions inside ONE jitted fori_loop and fetching a scalar
to host — the fetch cannot complete before every iteration has executed.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def time_op(op, x, iters=8, warmup=1):
    """op: array -> array (any shape/dtype). Returns seconds per single op."""

    @jax.jit
    def chained(x0):
        def body(_, carry):
            x, acc = carry
            y = op(x)
            acc = acc + jnp.mean(y.astype(jnp.float32))
            # feed the accumulator back so iterations can't be hoisted/merged
            x = x + jnp.asarray(acc * 1e-30, x.dtype)
            return x, acc

        _, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0)))
        return acc

    float(np.asarray(chained(x)))  # compile + warm
    for _ in range(warmup):
        float(np.asarray(chained(x)))
    t0 = time.perf_counter()
    float(np.asarray(chained(x)))
    return (time.perf_counter() - t0) / iters
