"""Config-driven U-Net field segmenter — pure-JAX, NHWC, pytree params.

Same architecture family as the reference (unet_model.py:23-86): ``depth``
DoubleConv encoder levels (base_width·2^i channels), 2×2 max-pool downsamples,
a DoubleConv bottleneck, and a decoder of (2×2 transpose conv → skip concat →
DoubleConv) stages, closed by a 1×1 conv whose bias initializes to −4 to bias
logits toward background (unet_model.py:52-53). Defaults give exactly the
reference's 31,043,651-parameter 3→3 class model.

Functional design: ``init_unet`` returns ``(params, state)`` pytrees (state =
BatchNorm running stats); ``unet_apply(params, state, x, train=...)`` returns
``(logits, new_state)``. For serving, ``fold_unet`` folds eval-mode BN into
conv weights once, and ``unet_apply_folded`` runs the conv+ReLU-only graph —
the form XLA fuses end-to-end on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from twinvoice_tpu.config import UNetConfig
from twinvoice_tpu.ops.conv import (
    conv1x1,
    conv3x3,
    conv_transpose2x2,
    conv_transpose2x2_serving,
    init_conv,
    init_conv_transpose,
    max_pool2,
)
from twinvoice_tpu.ops.norm import (
    batchnorm_apply,
    fold_batchnorm_into_conv,
    init_batchnorm,
)

# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_double_conv(key, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    bn1_p, bn1_s = init_batchnorm(cout, dtype=dtype)
    bn2_p, bn2_s = init_batchnorm(cout, dtype=dtype)
    params = {
        "conv1": init_conv(k1, 3, 3, cin, cout, dtype=dtype),
        "bn1": bn1_p,
        "conv2": init_conv(k2, 3, 3, cout, cout, dtype=dtype),
        "bn2": bn2_p,
    }
    state = {"bn1": bn1_s, "bn2": bn2_s}
    return params, state


def init_unet(key, cfg: UNetConfig = UNetConfig(), *, dtype=jnp.float32):
    """Returns (params, state) pytrees."""
    widths = cfg.encoder_widths()
    keys = iter(jax.random.split(key, 2 * cfg.depth + 2 + cfg.depth))
    params = {"enc": [], "dec": [], "up": []}
    state = {"enc": [], "dec": []}

    cin = cfg.in_channels
    for wdt in widths:
        p, s = _init_double_conv(next(keys), cin, wdt, dtype)
        params["enc"].append(p)
        state["enc"].append(s)
        cin = wdt

    bw = cfg.bottleneck_width()
    p, s = _init_double_conv(next(keys), widths[-1], bw, dtype)
    params["bottleneck"] = p
    state["bottleneck"] = s

    up_in = bw
    for wdt in reversed(widths):
        params["up"].append(init_conv_transpose(next(keys), up_in, wdt, dtype=dtype))
        p, s = _init_double_conv(next(keys), 2 * wdt, wdt, dtype)
        params["dec"].append(p)
        state["dec"].append(s)
        up_in = wdt

    params["out"] = init_conv(
        next(keys), 1, 1, widths[0], cfg.num_classes, dtype=dtype,
        bias_init=cfg.out_bias_init,
    )
    return params, state


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _double_conv(p, s, x, *, train, momentum, eps, fast_norm=False):
    x = conv3x3(x, p["conv1"])
    x, s1 = batchnorm_apply(x, p["bn1"], s["bn1"], train=train, momentum=momentum,
                            eps=eps, norm_in_compute_dtype=fast_norm)
    x = jax.nn.relu(x)
    x = conv3x3(x, p["conv2"])
    x, s2 = batchnorm_apply(x, p["bn2"], s["bn2"], train=train, momentum=momentum,
                            eps=eps, norm_in_compute_dtype=fast_norm)
    x = jax.nn.relu(x)
    return x, {"bn1": s1, "bn2": s2}


def unet_apply(params, state, x, *, cfg: UNetConfig = UNetConfig(), train=False,
               remat=False, fast_norm=False):
    """Forward pass. ``x``: (N,H,W,Cin) with H,W divisible by 2^depth.

    Returns ``(logits (N,H,W,num_classes), new_state)``.

    ``remat=True`` wraps every DoubleConv in ``jax.checkpoint``: the
    backward pass recomputes block internals instead of keeping them live,
    trading ~⅓ more FLOPs for a large activation-memory cut — the standard
    TPU lever for pushing the train batch past the HBM edge (the block
    inputs/skips alone stay resident).

    ``fast_norm=True`` runs the BN normalize in the activation dtype
    (stats stay fp32) — see ops.norm.batchnorm_apply.
    """
    mom, eps = cfg.bn_momentum, cfg.bn_eps
    def dc(p, s, h):
        return _double_conv(p, s, h, train=train, momentum=mom, eps=eps,
                            fast_norm=fast_norm)

    if remat:
        dc = jax.checkpoint(dc)
    new_state = {"enc": [], "dec": []}
    skips = []
    h = x
    for p, s in zip(params["enc"], state["enc"]):
        h, ns = dc(p, s, h)
        new_state["enc"].append(ns)
        skips.append(h)
        h = max_pool2(h)

    h, ns = dc(params["bottleneck"], state["bottleneck"], h)
    new_state["bottleneck"] = ns

    for up_p, dec_p, dec_s, skip in zip(
        params["up"], params["dec"], state["dec"], reversed(skips)
    ):
        h = conv_transpose2x2(h, up_p)
        h = jnp.concatenate([h, skip], axis=-1)  # [upsampled, skip] — torch cat order
        h, ns = dc(dec_p, dec_s, h)
        new_state["dec"].append(ns)

    logits = conv1x1(h, params["out"])
    return logits, new_state


# ---------------------------------------------------------------------------
# BN-folded serving form
# ---------------------------------------------------------------------------


def _fold_double_conv(p, s, eps):
    return {
        "conv1": fold_batchnorm_into_conv(p["conv1"], p["bn1"], s["bn1"], eps=eps),
        "conv2": fold_batchnorm_into_conv(p["conv2"], p["bn2"], s["bn2"], eps=eps),
    }


def fold_unet(params, state, *, cfg: UNetConfig = UNetConfig(), dtype=None):
    """Fold all eval-mode BNs into their convs; optional dtype cast (bf16 serving)."""
    eps = cfg.bn_eps
    folded = {
        "enc": [
            _fold_double_conv(p, s, eps)
            for p, s in zip(params["enc"], state["enc"])
        ],
        "bottleneck": _fold_double_conv(params["bottleneck"], state["bottleneck"], eps),
        "up": [dict(p) for p in params["up"]],
        "dec": [
            _fold_double_conv(p, s, eps)
            for p, s in zip(params["dec"], state["dec"])
        ],
        "out": dict(params["out"]),
    }
    if dtype is not None:
        folded = jax.tree.map(lambda a: a.astype(dtype), folded)
    return folded


def _folded_double_conv(p, x):
    x = jax.nn.relu(conv3x3(x, p["conv1"]))
    x = jax.nn.relu(conv3x3(x, p["conv2"]))
    return x


def unet_apply_folded(folded, x):
    """Inference-only forward on BN-folded params (conv+ReLU graph).

    The decoder's skip concatenation is algebraically eliminated:
    ``conv([up, skip], K) == conv(up, K[:, :, :C]) + conv(skip, K[:, :, C:])``
    so the (2C, H, W) concat tensor — pure HBM write+read traffic at full
    resolution — is never materialized.
    """
    skips = []
    h = x
    for p in folded["enc"]:
        h = _folded_double_conv(p, h)
        skips.append(h)
        h = max_pool2(h)
    h = _folded_double_conv(folded["bottleneck"], h)
    for up_p, dec_p, skip in zip(folded["up"], folded["dec"], reversed(skips)):
        h = conv_transpose2x2_serving(h, up_p)
        c = h.shape[-1]
        k1 = dec_p["conv1"]["kernel"]
        part_up = conv3x3(h, {"kernel": k1[:, :, :c], "bias": dec_p["conv1"]["bias"]})
        part_skip = conv3x3(skip, {"kernel": k1[:, :, c:]})
        h = jax.nn.relu(part_up + part_skip)
        h = jax.nn.relu(conv3x3(h, dec_p["conv2"]))
    return conv1x1(h, folded["out"])


def param_count(params) -> int:
    return sum(int(a.size) for a in jax.tree.leaves(params))
