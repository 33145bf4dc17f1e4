"""On-device image ops: resize + normalize, replacing host cv2/PIL calls
(reference dataset.py:24-29, inference.py:30-44, rescue…py:56-57).

These keep preprocessing inside the jitted graph so an invoice goes raw
uint8 → normalized NHWC without leaving the device. Exact-parity note: PIL's
``Image.resize(BILINEAR)`` is an area-style filter that differs from the
standard half-pixel bilinear below; the parity test configs therefore resize
on host with PIL, while the serving path uses these device ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x, h, w):
    """Bilinear resize of NHWC (or HWC) to (h, w); half-pixel convention."""
    batched = x.ndim == 4
    if not batched:
        x = x[None]
    y = jax.image.resize(
        x.astype(jnp.float32), (x.shape[0], h, w, x.shape[3]), method="bilinear"
    )
    return y if batched else y[0]


def resize_nearest(x, h, w):
    """Nearest resize (masks; reference uses INTER_NEAREST, rescue…py:57)."""
    batched = x.ndim == 4
    if not batched:
        x = x[None]
    y = jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="nearest")
    return y if batched else y[0]


def normalize_uint8(x, dtype=jnp.float32):
    """uint8 [0,255] → float [0,1] (reference /255.0, inference.py:36)."""
    return x.astype(dtype) / jnp.asarray(255.0, dtype)
