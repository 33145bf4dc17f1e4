"""Pipeline parallelism: GPipe-style microbatched stage execution.

The reference has no distributed execution at all; SURVEY.md §2.4 reserves a
pipeline-parallel interface in this framework. This module implements the
TPU-native building block: S homogeneous stages laid out on the mesh's
``stage`` axis, microbatches streaming stage-to-stage over ICI via
``ppermute`` inside ``shard_map``, with the classic (M + S − 1)-step GPipe
schedule expressed as one ``lax.scan`` (static shapes, no host control flow).

Scope note: stages must share input/output shape (a homogeneous tower —
e.g. repeated conv/context blocks). The U-Net's pyramid stages are
heterogeneous, so its natural axes remain DP/TP/spatial; this primitive
serves deep uniform towers (and documents the PP contract for future model
families).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_apply(stage_fn, stage_params, x_micro, mesh: Mesh, axis: str = "stage"):
    """Run microbatches through S pipelined stages.

    - ``stage_fn(params_i, x) -> y`` with ``y.shape == x.shape``
    - ``stage_params``: pytree whose leaves have a leading stage dim S
    - ``x_micro``: (M, *item_shape) microbatches
    Returns (M, *item_shape) outputs, as produced by the last stage.
    """
    n_stages = mesh.shape[axis]
    n_micro = x_micro.shape[0]
    total_steps = n_micro + n_stages - 1

    def per_stage(params, xs):
        # params: this stage's slice (leading dim 1) ; xs: full microbatch
        # stream (replicated — only stage 0 consumes it)
        params = jax.tree.map(lambda a: a[0], params)
        stage = lax.axis_index(axis)
        # carry must match stage_fn's output aval exactly (incl. weak_type)
        out_aval = jax.eval_shape(lambda: stage_fn(params, xs[0]))
        zero = jnp.zeros(out_aval.shape, out_aval.dtype)
        # the carry is device-varying (each stage holds different data)
        zero = lax.pcast(zero, (axis,), to="varying")

        def step(carry, t):
            buf = carry  # my current input candidate from the left
            # stage 0 injects microbatch t (or zeros once drained)
            inject = jnp.where(t < n_micro, xs[jnp.clip(t, 0, n_micro - 1)], zero)
            my_in = jnp.where(stage == 0, inject, buf)
            out = stage_fn(params, my_in)
            # pass my output rightward for the next step
            nxt = lax.ppermute(
                out, axis, [(i, i + 1) for i in range(n_stages - 1)]
            )
            # the last stage emits a finished microbatch at steps >= S-1
            emit = jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out))
            return nxt, emit

        _, emitted = lax.scan(step, zero, jnp.arange(total_steps))
        # keep the last n_micro emissions; sum over stages so the final
        # all-reduce reconstructs the last stage's outputs everywhere
        outs = emitted[n_stages - 1 :]
        return lax.psum(outs, axis)

    smap = jax.shard_map(
        per_stage,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
    )
    return smap(stage_params, x_micro)


def stack_stage_params(params_list):
    """List of per-stage param pytrees → single pytree with leading stage dim."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
