"""Segmentation loss stack: multilabel dice + focal mixture.

Exact formulas of the reference loss (train.py:18-59): sigmoid on logits,
then ``0.85·dice + 0.15·focal`` with dice smooth=1.0 computed per
(batch, class) over flattened spatial dims, and BCE-based focal with
α=0.8, γ=2, probability clamp eps=1e-7. All weights configurable via
:class:`twinvoice_tpu.config.LossConfig`.

Computation runs in fp32 regardless of activation dtype — loss parity is
part of BASELINE config 3's loss-curve match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from twinvoice_tpu.config import LossConfig


def dice_loss(pred, target, smooth=1.0):
    """Mean (over batch×class) soft-dice loss.

    ``pred``/``target``: (N,H,W,C) probabilities in [0,1].
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    inter = jnp.sum(pred * target, axis=(1, 2))      # (N, C)
    union = jnp.sum(pred, axis=(1, 2)) + jnp.sum(target, axis=(1, 2))
    dice = 1.0 - (2.0 * inter + smooth) / (union + smooth)
    return jnp.mean(dice)


def focal_loss(pred, target, alpha=0.8, gamma=2.0, eps=1e-7):
    """Mean elementwise BCE-based focal loss on probabilities."""
    p = jnp.clip(pred.astype(jnp.float32), eps, 1.0 - eps)
    t = target.astype(jnp.float32)
    bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    pt = jnp.exp(-bce)
    return jnp.mean(alpha * (1.0 - pt) ** gamma * bce)


def invoice_loss(logits, target, cfg: LossConfig = LossConfig()):
    """sigmoid(logits) → dice+focal mixture. ``logits``: (N,H,W,C)."""
    pred = jax.nn.sigmoid(logits.astype(jnp.float32))
    return (
        cfg.dice_weight * dice_loss(pred, target, cfg.dice_smooth)
        + cfg.focal_weight * focal_loss(pred, target, cfg.focal_alpha, cfg.focal_gamma, cfg.focal_eps)
    )
