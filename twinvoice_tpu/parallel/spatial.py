"""Spatial (image-H) parallelism with explicit halo exchange.

The conv-net analogue of sequence/context parallelism (SURVEY.md §2.4, §5.7):
for inputs larger than one chip's comfort (e.g. >512² camera frames), shard
the H dimension across the mesh's ``spatial`` axis and exchange 1-pixel
border rows between neighbors before each 3×3 conv, via ``ppermute`` over
ICI, inside ``shard_map``.

Two routes exist in this framework:
- implicit: annotate shardings and let XLA SPMD insert halo collectives
  (what core.mesh + the pjit train step do) — the default;
- explicit (this module): hand-written halos under ``shard_map``, the
  building block for fused halo+compute Pallas kernels and for schedules XLA
  won't find (e.g. halo prefetch overlapped with the previous layer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from twinvoice_tpu.ops.conv import conv2d


def halo_exchange_h(x, axis_name: str, halo: int = 1):
    """Exchange ``halo`` boundary rows with both H-neighbors.

    ``x``: local shard (N, H_local, W, C) inside shard_map. Returns
    (N, H_local + 2*halo, W, C) with zero padding at the global edges —
    matching a global pad-1 conv.
    """
    n_shards = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)

    top_rows = x[:, :halo]          # my top rows -> neighbor above wants them? no:
    bot_rows = x[:, -halo:]

    # receive the bottom rows of the shard ABOVE me (source idx-1 -> me)
    from_above = lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n_shards) for i in range(n_shards)]
    )
    # receive the top rows of the shard BELOW me (source idx+1 -> me)
    from_below = lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n_shards) for i in range(n_shards)]
    )
    zeros = jnp.zeros_like(from_above)
    from_above = jnp.where(idx == 0, zeros, from_above)
    from_below = jnp.where(idx == n_shards - 1, zeros, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=1)


def conv3x3_spatial(x, p, axis_name: str):
    """3×3 pad-1 conv on an H-sharded activation (call inside shard_map)."""
    xh = halo_exchange_h(x, axis_name, halo=1)
    # pad W only; H is already extended by the halo
    return conv2d(x=xh, kernel=p["kernel"], bias=p.get("bias"),
                  padding=((0, 0), (1, 1)))


def spatial_shard_apply(fn, mesh: Mesh, axis: str = "spatial"):
    """Wrap a per-shard function (taking already-sharded NHWC x) in shard_map
    with H sharded over ``axis`` and everything else replicated.

    ``fn(x_shard, params)`` runs per-device; use :func:`conv3x3_spatial` /
    :func:`halo_exchange_h` inside it for cross-shard convs.
    """
    smap = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None),
    )
    return smap
