"""Compact convolutional CTC recognizer (pure-fn, NHWC, MXU-friendly).

Architecture: 4 conv+BN+ReLU stages with 2×2 pooling collapse the 32×256
grayscale line to a 32-step feature sequence; two width-wise 1D context
convs (a small TCN — no recurrence, so the whole model is one feed-forward
XLA graph, unlike EasyOCR's LSTM recognizer) and a linear head emit CTC
logits. ~0.9M params.

Functional contract mirrors models.unet: ``init_crnn`` → (params, state);
``crnn_apply(params, state, x, train)`` → (logits (B, T, C), new_state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from twinvoice_tpu.ops.conv import conv2d, init_conv, max_pool2
from twinvoice_tpu.ops.norm import batchnorm_apply, init_batchnorm
from twinvoice_tpu.ocr.jaxocr.charset import NUM_CLASSES

IMG_H = 32
IMG_W = 256
TIME_STEPS = IMG_W // 8      # legacy 't32' arch: 3 2×2 pools → 32 steps
TIME_STEPS_T64 = IMG_W // 4  # 't64' arch: last pool is height-only → 64 steps

_CONV_CHANNELS = (32, 64, 96, 128)
_CONTEXT = 256


def init_crnn(key, *, dtype=jnp.float32, num_classes=NUM_CLASSES,
              channels=_CONV_CHANNELS, context=_CONTEXT):
    """``channels``/``context`` widen the trunk (the "wide" capacity
    variant trains CJK glyph classes better); widths are recorded in the
    weights file so loading is self-describing."""
    keys = iter(jax.random.split(key, 16))
    params = {"conv": [], "bn": [], "ctx": [], "ctx_bn": []}
    state = {"bn": [], "ctx_bn": []}
    cin = 1
    for c in channels:
        params["conv"].append(init_conv(next(keys), 3, 3, cin, c, dtype=dtype))
        bn_p, bn_s = init_batchnorm(c, dtype=dtype)
        params["bn"].append(bn_p)
        state["bn"].append(bn_s)
        cin = c
    feat = channels[-1] * (IMG_H // 8)  # height collapsed into features
    params["proj"] = init_conv(next(keys), 1, 1, feat, context, dtype=dtype)
    for _ in range(2):
        params["ctx"].append(init_conv(next(keys), 1, 5, context, context, dtype=dtype))
        bn_p, bn_s = init_batchnorm(context, dtype=dtype)
        params["ctx_bn"].append(bn_p)
        state["ctx_bn"].append(bn_s)
    params["head"] = init_conv(next(keys), 1, 1, context, num_classes, dtype=dtype)
    return params, state


def crnn_apply(params, state, x, *, train=False, arch="t32"):
    """``x``: (B, 32, 256, 1) float in [0,1] (dark text on light bg is fine;
    the first BN normalizes polarity). Returns (logits (B, T, classes), state).

    ``arch``: "t32" (legacy, 3 symmetric pools → T=32) or "t64" (the third
    pool collapses height only → T=64). Parameter shapes are IDENTICAL
    between the two — only the pooling plan differs — so the arch a weights
    file was trained for is recorded in the file (train.save_weights) and
    must be passed here. T=64 exists because the error analysis
    (scripts/ocr_error_analysis.py) showed CTC frame starvation: at T=32 a
    13-char invoice-no string gets ~2.4 frames/char and the dominant error
    class was character DELETIONS.
    """
    from jax import lax

    new_state = {"bn": [], "ctx_bn": []}
    h = x
    for i, (cp, bp) in enumerate(zip(params["conv"], params["bn"])):
        h = conv2d(h, cp["kernel"], cp["bias"], padding=((1, 1), (1, 1)))
        h, s = batchnorm_apply(h, bp, state["bn"][i], train=train)
        new_state["bn"].append(s)
        h = jax.nn.relu(h)
        if i < 3:
            if i == 2 and arch == "t64":
                # height-only pool: keep the time axis at IMG_W//4
                h = lax.reduce_window(
                    h, -jnp.inf, lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID"
                )
            else:
                h = max_pool2(h)
    # (B, 4, 32, 128) → time-major sequence (B, 1, 32, 512)
    b, hh, ww, cc = h.shape
    h = jnp.transpose(h, (0, 2, 1, 3)).reshape(b, 1, ww, hh * cc)
    h = jax.nn.relu(conv2d(h, params["proj"]["kernel"], params["proj"]["bias"], padding="VALID"))
    for i, (cp, bp) in enumerate(zip(params["ctx"], params["ctx_bn"])):
        r = conv2d(h, cp["kernel"], cp["bias"], padding=((0, 0), (2, 2)))
        r, s = batchnorm_apply(r, bp, state["ctx_bn"][i], train=train)
        new_state["ctx_bn"].append(s)
        h = h + jax.nn.relu(r)  # residual context
    logits = conv2d(h, params["head"]["kernel"], params["head"]["bias"], padding="VALID")
    return logits[:, 0], new_state
