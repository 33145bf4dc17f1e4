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

from twinvoice_tpu.ops.conv import conv2d, conv_transpose2x2_serving, max_pool2


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


def _folded_double_conv_spatial(p, x, axis_name: str):
    """BN-folded DoubleConv (conv3×3+ReLU ×2) on an H-sharded activation.

    ONE halo-2 exchange feeds both convs: conv1 runs over the extended
    shard and emits one extra context row per side, which conv2 then
    consumes — half the collectives of per-conv halo-1 exchanges. At the
    global top/bottom edges those context rows must be literal zeros
    (dense conv2 zero-pads its input there), not relu(conv1(zero-pad)),
    so they are masked on the edge shards.
    """
    n_shards = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    xh = halo_exchange_h(x, axis_name, halo=2)                  # H+4 rows
    h = jax.nn.relu(conv2d(xh, p["conv1"]["kernel"], p["conv1"]["bias"],
                           padding=((0, 0), (1, 1))))           # H+2 rows
    h = h.at[:, :1].mul(jnp.where(idx == 0, 0.0, 1.0))
    h = h.at[:, -1:].mul(jnp.where(idx == n_shards - 1, 0.0, 1.0))
    h = jax.nn.relu(conv2d(h, p["conv2"]["kernel"], p["conv2"]["bias"],
                           padding=((0, 0), (1, 1))))           # H rows
    return h


def unet_apply_folded_spatial(folded, x, axis_name: str = "spatial"):
    """Full BN-folded U-Net forward on an H-sharded input (inside shard_map).

    The serving-side capability SURVEY §5.7 names (the conv-net analogue of
    ring attention): images larger than one chip's comfort — e.g. 1024²+
    camera frames — run with H split across the mesh's spatial axis. The
    reference has no counterpart (train.py:94 is single-device, 512² only).

    Only the 3×3 convs reach across shards (one halo-2 exchange per
    DoubleConv, via :func:`_folded_double_conv_spatial`); every other op is
    row-local by construction:
    - 2×2/s2 max-pool windows never straddle a shard boundary while the
      local H stays even — hence the divisibility precondition below;
    - 2×2/s2 transpose conv maps input row i to output rows 2i/2i+1 only;
    - skip concats pair rows that live on the same shard at every level
      (pool and transpose-conv preserve the shard-relative row mapping);
    - the 1×1 out-conv is pointwise.

    Matches :func:`twinvoice_tpu.models.unet.unet_apply_folded` exactly
    (same concat-free decoder algebra). Precondition: local H divisible by
    2^depth, i.e. global H divisible by n_shards · 2^depth.
    """
    depth = len(folded["enc"])
    assert x.shape[1] % (1 << depth) == 0, (
        f"local H {x.shape[1]} not divisible by 2^{depth}; "
        f"use a global H divisible by n_shards*2^depth")
    skips = []
    h = x
    for p in folded["enc"]:
        h = _folded_double_conv_spatial(p, h, axis_name)
        skips.append(h)
        h = max_pool2(h)
    h = _folded_double_conv_spatial(folded["bottleneck"], h, axis_name)
    n_shards = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    for up_p, dec_p, skip in zip(folded["up"], folded["dec"], reversed(skips)):
        h = conv_transpose2x2_serving(h, up_p)
        # concat-free decoder DoubleConv with a shared halo-2 schedule:
        # conv([up, skip], K1) == conv(up, K1[:,:,:C]) + conv(skip, K1[:,:,C:])
        c = h.shape[-1]
        hh = halo_exchange_h(h, axis_name, halo=2)
        sh = halo_exchange_h(skip, axis_name, halo=2)
        k1 = dec_p["conv1"]["kernel"]
        part_up = conv2d(hh, k1[:, :, :c], dec_p["conv1"]["bias"],
                         padding=((0, 0), (1, 1)))
        part_skip = conv2d(sh, k1[:, :, c:], None, padding=((0, 0), (1, 1)))
        g = jax.nn.relu(part_up + part_skip)                    # H+2 rows
        g = g.at[:, :1].mul(jnp.where(idx == 0, 0.0, 1.0))
        g = g.at[:, -1:].mul(jnp.where(idx == n_shards - 1, 0.0, 1.0))
        h = jax.nn.relu(conv2d(g, dec_p["conv2"]["kernel"],
                               dec_p["conv2"]["bias"],
                               padding=((0, 0), (1, 1))))       # H rows
    return conv2d(h, folded["out"]["kernel"], folded["out"]["bias"],
                  padding="VALID")


def spatial_unet_forward(folded, x, mesh: Mesh, axis: str = "spatial"):
    """jit-able entry: H-shard ``x`` over ``mesh[axis]`` and run the full
    folded U-Net with explicit halo exchanges; params replicated."""
    fn = jax.shard_map(
        lambda ff, xs: unet_apply_folded_spatial(ff, xs, axis),
        mesh=mesh,
        in_specs=(P(), P(None, axis, None, None)),
        out_specs=P(None, axis, None, None),
    )
    return fn(folded, x)


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
