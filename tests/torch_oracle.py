"""Functional torch oracle for parity tests.

Runs the reference architecture directly from a reference-schema state_dict
using ``torch.nn.functional`` ops only (no Modules). This gives golden
activations/losses to compare the JAX stack against, without depending on —
or resembling — the reference's class-based implementation.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

DEPTH = 4
WIDTHS = (64, 128, 256, 512)


def random_state_dict(rng, widths=WIDTHS, in_ch=3, n_classes=3, scale=0.1):
    """Random reference-schema state_dict (numpy float32).

    BN running stats get non-trivial values so eval-mode folding is exercised.
    """

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * scale

    sd = {}

    def double_conv(prefix, cin, cout):
        sd[f"{prefix}.net.0.weight"] = t(cout, cin, 3, 3)
        sd[f"{prefix}.net.0.bias"] = t(cout)
        sd[f"{prefix}.net.1.weight"] = 1.0 + t(cout)
        sd[f"{prefix}.net.1.bias"] = t(cout)
        sd[f"{prefix}.net.1.running_mean"] = t(cout)
        sd[f"{prefix}.net.1.running_var"] = (1.0 + t(cout) ** 2).astype(np.float32)
        sd[f"{prefix}.net.3.weight"] = t(cout, cout, 3, 3)
        sd[f"{prefix}.net.3.bias"] = t(cout)
        sd[f"{prefix}.net.4.weight"] = 1.0 + t(cout)
        sd[f"{prefix}.net.4.bias"] = t(cout)
        sd[f"{prefix}.net.4.running_mean"] = t(cout)
        sd[f"{prefix}.net.4.running_var"] = (1.0 + t(cout) ** 2).astype(np.float32)

    cin = in_ch
    for i, w in enumerate(widths):
        double_conv(f"down{i + 1}", cin, w)
        cin = w
    bw = widths[-1] * 2
    double_conv("bottleneck", widths[-1], bw)
    up_in = bw
    for i in range(DEPTH, 0, -1):
        w = widths[i - 1]
        sd[f"up{i}.weight"] = t(up_in, w, 2, 2)
        sd[f"up{i}.bias"] = t(w)
        double_conv(f"conv{i}", 2 * w, w)
        up_in = w
    sd["out_conv.weight"] = t(n_classes, widths[0], 1, 1)
    sd["out_conv.bias"] = np.full((n_classes,), -4.0, np.float32)
    return sd


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key]))


def _double_conv(sd, prefix, x, train):
    for a, b in ((0, 1), (3, 4)):
        x = F.conv2d(x, _t(sd, f"{prefix}.net.{a}.weight"), _t(sd, f"{prefix}.net.{a}.bias"), padding=1)
        x = F.batch_norm(
            x,
            _t(sd, f"{prefix}.net.{b}.running_mean"),
            _t(sd, f"{prefix}.net.{b}.running_var"),
            _t(sd, f"{prefix}.net.{b}.weight"),
            _t(sd, f"{prefix}.net.{b}.bias"),
            training=train,
            momentum=0.1,
            eps=1e-5,
        )
        x = F.relu(x)
    return x


def forward(sd, x_nchw, train=False):
    """Full reference forward. ``x_nchw``: numpy (N,C,H,W). Returns numpy logits."""
    with torch.no_grad():
        x = torch.from_numpy(np.asarray(x_nchw, np.float32))
        skips = []
        for i in range(1, DEPTH + 1):
            x = _double_conv(sd, f"down{i}", x, train)
            skips.append(x)
            x = F.max_pool2d(x, 2)
        x = _double_conv(sd, "bottleneck", x, train)
        for i in range(DEPTH, 0, -1):
            x = F.conv_transpose2d(x, _t(sd, f"up{i}.weight"), _t(sd, f"up{i}.bias"), stride=2)
            x = torch.cat([x, skips[i - 1]], dim=1)
            x = _double_conv(sd, f"conv{i}", x, train)
        x = F.conv2d(x, _t(sd, "out_conv.weight"), _t(sd, "out_conv.bias"))
        return x.numpy()


def invoice_loss(logits_nchw, target_nchw, dice_w=0.85, focal_w=0.15, alpha=0.8, gamma=2.0, smooth=1.0):
    """Golden loss value per the reference formulas (train.py:18-59)."""
    with torch.no_grad():
        pred = torch.sigmoid(torch.from_numpy(np.asarray(logits_nchw, np.float32)))
        target = torch.from_numpy(np.asarray(target_nchw, np.float32))
        p = pred.reshape(pred.shape[0], pred.shape[1], -1)
        t_ = target.reshape(target.shape[0], target.shape[1], -1)
        inter = (p * t_).sum(-1)
        union = p.sum(-1) + t_.sum(-1)
        dice = (1 - (2 * inter + smooth) / (union + smooth)).mean()
        eps = 1e-7
        pc = pred.clamp(eps, 1 - eps)
        bce = F.binary_cross_entropy(pc, target, reduction="none")
        pt = torch.exp(-bce)
        focal = (alpha * (1 - pt) ** gamma * bce).mean()
        return float(dice_w * dice + focal_w * focal)
