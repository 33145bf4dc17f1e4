"""Device-side postprocess: sigmoid → per-field threshold → bbox → pad/scale.

Replaces the reference's host-side numpy loop (inference.py:72-127) with
static-shaped masked reductions that stay inside the jitted graph — no
``np.where`` host sync, fully batchable. Semantics matched exactly:

- per-field thresholds (invoice_no 0.25, date 0.40, total_amount 0.30;
  inference.py:75-79)
- bbox = min/max of mask coordinates on the model grid (inference.py:85-93)
- scale to original size by (ow/IMG, oh/IMG) with ``int()`` truncation
  (inference.py:97-103)
- pad 15% of box size each side, clamped to the image (inference.py:106-112)
- empty mask or degenerate box ⇒ invalid (inference.py:87-89, 115-117).
  (The all-black crop mean<3 check needs crop pixels and stays host-side:
  inference.py:122-124.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bbox_from_probs(prob, thresholds):
    """Per-class mask bbox on the model grid.

    ``prob``: (H, W, C) probabilities; ``thresholds``: (C,).
    Returns ``(boxes (C,4) int32 [x1,y1,x2,y2] inclusive, valid (C,) bool)``.
    """
    h, w, c = prob.shape
    mask = prob > jnp.asarray(thresholds, prob.dtype)
    valid = jnp.any(mask, axis=(0, 1))
    rows = jnp.any(mask, axis=1)  # (H, C)
    cols = jnp.any(mask, axis=0)  # (W, C)
    yi = jax.lax.broadcasted_iota(jnp.int32, (h, c), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (w, c), 0)
    y1 = jnp.min(jnp.where(rows, yi, h), axis=0)
    y2 = jnp.max(jnp.where(rows, yi, -1), axis=0)
    x1 = jnp.min(jnp.where(cols, xi, w), axis=0)
    x2 = jnp.max(jnp.where(cols, xi, -1), axis=0)
    return jnp.stack([x1, y1, x2, y2], axis=-1), valid


def bbox_from_logits_fast(logits, logit_thresholds):
    """Bbox via max-reductions on raw logits — numerically identical to
    ``bbox_from_probs(sigmoid(logits), t)`` since ``max(x) > logit(t) ⟺
    any(sigmoid(x) > t)``, but touches the (H,W,C) tensor only twice, in its
    native dtype, with no mask materialization (the serving hot path).

    ``logits``: (H, W, C); ``logit_thresholds``: (C,) fp32.
    Returns ``(boxes (C,4) int32 [x1,y1,x2,y2] inclusive, valid (C,))``.
    """
    h, w, c = logits.shape
    thr = jnp.asarray(logit_thresholds, jnp.float32)
    row_max = jnp.max(logits, axis=1).astype(jnp.float32)  # (H, C)
    col_max = jnp.max(logits, axis=0).astype(jnp.float32)  # (W, C)
    rows = row_max > thr
    cols = col_max > thr
    valid = jnp.any(rows, axis=0)
    yi = jax.lax.broadcasted_iota(jnp.int32, (h, c), 0)   # row index per (H,C)
    xi = jax.lax.broadcasted_iota(jnp.int32, (w, c), 0)   # col index per (W,C)
    y1 = jnp.min(jnp.where(rows, yi, h), axis=0)
    y2 = jnp.max(jnp.where(rows, yi, -1), axis=0)
    x1 = jnp.min(jnp.where(cols, xi, w), axis=0)
    x2 = jnp.max(jnp.where(cols, xi, -1), axis=0)
    return jnp.stack([x1, y1, x2, y2], axis=-1), valid


def probability_to_logit_thresholds(thresholds):
    t = jnp.asarray(thresholds, jnp.float32)
    return jnp.log(t) - jnp.log1p(-t)


def scale_and_pad_boxes(boxes, valid, orig_size, grid_size, pad_frac):
    """Map grid boxes to original-image pixel boxes with reference semantics.

    ``orig_size``: (2,) int32 = (ow, oh). Returns ((C,4) int32 half-open-ish
    [x1,y1,x2,y2] exactly as the reference computes them, valid (C,) bool).
    """
    boxes = boxes.astype(jnp.float32)
    ow = orig_size[0].astype(jnp.float32)
    oh = orig_size[1].astype(jnp.float32)
    sx = ow / grid_size
    sy = oh / grid_size
    x1 = jnp.floor(boxes[:, 0] * sx)
    y1 = jnp.floor(boxes[:, 1] * sy)
    x2 = jnp.floor(boxes[:, 2] * sx)
    y2 = jnp.floor(boxes[:, 3] * sy)
    pad_x = jnp.floor((x2 - x1) * pad_frac)
    pad_y = jnp.floor((y2 - y1) * pad_frac)
    x1 = jnp.maximum(0.0, x1 - pad_x)
    y1 = jnp.maximum(0.0, y1 - pad_y)
    x2 = jnp.minimum(ow, x2 + pad_x)
    y2 = jnp.minimum(oh, y2 + pad_y)
    ok = valid & (x2 > x1) & (y2 > y1)
    out = jnp.stack([x1, y1, x2, y2], axis=-1).astype(jnp.int32)
    return out, ok


def masks_and_boxes(prob, orig_size, thresholds, pad_frac):
    """Single-image fused postprocess: (H,W,C) prob → masks + original-res boxes."""
    grid = prob.shape[0]
    mask = prob > jnp.asarray(thresholds, prob.dtype)
    gboxes, valid = bbox_from_probs(prob, thresholds)
    boxes, ok = scale_and_pad_boxes(gboxes, valid, orig_size, grid, pad_frac)
    return mask, boxes, ok
