"""Segmentation metrics. The reference tracks only training loss
(train.py:151-152); per-class IoU is required by BASELINE ("IoU parity") and
added here as a first-class metric.
"""

from __future__ import annotations

import jax.numpy as jnp


def per_class_iou(pred_mask, target_mask, eps=1e-7):
    """IoU per class. Inputs bool/0-1 arrays (N,H,W,C) → (C,) fp32."""
    p = pred_mask.astype(jnp.float32)
    t = target_mask.astype(jnp.float32)
    inter = jnp.sum(p * t, axis=(0, 1, 2))
    union = jnp.sum(jnp.maximum(p, t), axis=(0, 1, 2))
    return (inter + eps) / (union + eps)


def mean_iou(pred_mask, target_mask):
    return jnp.mean(per_class_iou(pred_mask, target_mask))
