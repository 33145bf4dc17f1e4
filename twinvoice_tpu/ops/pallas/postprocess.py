"""Pallas kernel: fused threshold → per-class bbox reduction.

The serving postprocess (SURVEY.md §7 step 3) turns (B, H, W, C) logits into
per-class bounding boxes. The XLA version (infer.postprocess) materializes a
full-resolution fp32 sigmoid + bool mask and runs four masked iota
reductions; this kernel does everything in one VMEM pass per (image, class):
threshold in *logit space* (sigmoid(x) > t ⟺ x > logit(t), so the sigmoid
disappears), then row/col any-reductions and masked min/max — no
intermediate mask in HBM at all.

Layout note: the kernel wants (B, C, H, W) so the 512-wide W dim sits in
lanes; the caller transposes (a cheap relayout vs. the conv stack).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(thr_ref, x_ref, boxes_ref, valid_ref):
    n_classes = x_ref.shape[1]
    for c in range(n_classes):           # static unroll over the 3 fields
        x = x_ref[0, c]                  # (H, W) logits
        h, w = x.shape
        thr = thr_ref[c]                 # logit-space threshold
        mask = x > thr

        rows = jnp.any(mask, axis=1, keepdims=True)      # (H, 1)
        cols = jnp.any(mask, axis=0, keepdims=True)      # (1, W)

        yi = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
        xi = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

        y1 = jnp.min(jnp.where(rows, yi, h))
        y2 = jnp.max(jnp.where(rows, yi, -1))
        x1 = jnp.min(jnp.where(cols, xi, w))
        x2 = jnp.max(jnp.where(cols, xi, -1))

        boxes_ref[0, c, 0] = x1
        boxes_ref[0, c, 1] = y1
        boxes_ref[0, c, 2] = x2
        boxes_ref[0, c, 3] = y2
        valid_ref[0, c, 0] = (y2 >= 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bbox_postprocess_pallas(logits_nhwc, thresholds, *, interpret=False):
    """(B,H,W,C) logits + (C,) probability thresholds → ((B,C,4) int32 grid
    boxes [x1,y1,x2,y2] inclusive, (B,C) bool valid). Matches
    infer.postprocess.bbox_from_probs exactly.
    """
    b, h, w, c = logits_nhwc.shape
    x = jnp.transpose(logits_nhwc, (0, 3, 1, 2)).astype(jnp.float32)
    thr = jnp.asarray(thresholds, jnp.float32)
    logit_thr = jnp.log(thr) - jnp.log1p(-thr)       # logit(t)

    boxes, valid = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # thresholds (C,)
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            # trailing singleton keeps the block's last-two dims equal to the
            # full array dims (Mosaic SMEM blocking rule)
            pl.BlockSpec((1, c, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, 4), jnp.int32),
            jax.ShapeDtypeStruct((b, c, 1), jnp.int32),
        ],
        interpret=interpret,
    )(logit_thr, x)
    return boxes, valid[..., 0].astype(bool)
