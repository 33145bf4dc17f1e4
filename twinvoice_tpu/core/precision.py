"""Precision policy: fp32 parity mode vs bf16 fast mode.

The BASELINE throughput target (~219 TFLOPs/s sustained at 1000 img/s/chip)
is only reachable in bf16 on the MXU; the parity configs demand fp32. This
tiny policy object is threaded through model apply / Segmenter so every
benchmark can state which variant produced each number (BASELINE.md note).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    accum_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def parity():
        return Policy()

    @staticmethod
    def fast():
        return Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)

    def cast_params(self, params):
        return jax.tree.map(lambda a: a.astype(self.param_dtype), params)

    def cast_input(self, x):
        return x.astype(self.compute_dtype)
