"""Device mesh construction and sharding rules.

The reference has no distributed story at all (single device,
train.py:94); this module is the greenfield TPU design (SURVEY.md §2.4):
a ``(data, model, spatial)`` mesh where

- ``data``    — batch sharding (DP). Gradients sync via the psum XLA inserts.
- ``model``   — conv out-channel sharding (TP analogue for a conv net).
- ``spatial`` — image-H sharding; XLA SPMD inserts the halo exchanges that
  overlapping 3×3 convs need (the conv-net analogue of sequence parallelism,
  SURVEY.md §5.7).

On TPU the communication backend *is* XLA collectives over ICI — there is no
NCCL/MPI equivalent to write; the framework's job is mesh construction and
sharding annotation (SURVEY.md §5.8).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from twinvoice_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    model, spatial = cfg.model, cfg.spatial
    data = cfg.data if cfg.data > 0 else n // (model * spatial)
    assert data * model * spatial == n, (
        f"mesh {data}x{model}x{spatial} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, model, spatial)
    return Mesh(arr, ("data", "model", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: N over 'data', H over 'spatial' (halo handled by XLA)."""
    return NamedSharding(mesh, P("data", "spatial", None, None))


def _spec_for(path_leaf_shape, axis_size):
    """Sharding rule for one param array: shard the channel dim over 'model'.

    - conv kernels (kH,kW,Ci,Co): shard Co
    - transpose-conv kernels (2,2,Ci,Co): shard Co
    - biases / BN vectors (C,): shard C
    Arrays whose channel dim isn't divisible by the axis stay replicated.
    """
    shape = path_leaf_shape
    if len(shape) == 4 and shape[-1] % axis_size == 0 and shape[-1] >= 2 * axis_size:
        return P(None, None, None, "model")
    if len(shape) == 1 and shape[0] % axis_size == 0 and shape[0] >= 2 * axis_size:
        return P("model")
    return P()


def param_shardings(mesh: Mesh, params):
    """Tree of NamedShardings for a params/state pytree (TP channel sharding)."""
    axis = mesh.shape["model"]
    if axis == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    return jax.tree.map(
        lambda a: NamedSharding(mesh, _spec_for(a.shape, axis)), params
    )
